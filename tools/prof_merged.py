"""A/B the merged warp+assembly kernel (variational/fused_warp.py) against
the two-kernel composition it replaces, on the live chip.

Two levels:
  1. phase: one data-term evaluation (warp -> assembly vs merged), chained
     fori per docs/PROFILING.md so dispatch latency cancels;
  2. solve: the full bench jet solve (variational_mt_batched, batch 4) with
     merge_warp on vs off.

Run on the real chip: python tools/prof_merged.py [--solve-only]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

H, W, REF = 270, 480, 2
F = 2 * REF + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solve-only", action="store_true")
    ap.add_argument("--phase-only", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="solve sweep over batch x {unroll, jet_vmap} x "
                         "{merge_warp off/on}; picks the jets/s champion")
    ap.add_argument("--unroll-sweep", type=str, default="",
                    help="comma-separated unroll batch sizes to sweep at "
                         "the champion kernel config (merge_warp on), e.g. "
                         "'3,5,6'; updates the champion record if beaten")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _moving_sequence
    from slowflow_tpu.core.warp_shift import warp_stack_auto, _coords
    from slowflow_tpu.variational.fused_data import fused_data_system
    from slowflow_tpu.variational.fused_warp import fused_warp_data
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, succ_mask, variational_mt_batched)

    p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                         rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                         p_scale=0.9, niter_alter=10, niter_outer=10,
                         niter_inner=1, niter_solver=30,
                         occlusion_reasoning=True, smoothing=1)
    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    seq1 = jnp.asarray(_moving_sequence(F, H, W, 1.5, -0.8, seed=0))
    wx = jnp.full((H, W), 1.45, jnp.float32) \
        + jnp.asarray(rng.normal(0, 0.15, (H, W)), jnp.float32)
    wy = jnp.full((H, W), -0.8, jnp.float32) \
        + jnp.asarray(rng.normal(0, 0.1, (H, W)), jnp.float32)
    du = jnp.asarray(rng.normal(0, 0.1, (H, W)), jnp.float32)
    dv = jnp.asarray(rng.normal(0, 0.1, (H, W)), jnp.float32)
    cw = jnp.ones((3, H, W), jnp.float32)

    def timed(fn, n, *args, repeats=3):
        @partial(jax.jit, static_argnames="n")
        def run(a, n):
            def body(i, c):
                out = fn(*jax.tree_util.tree_map(lambda x: x + c * 1e-20, a))
                leaves = jax.tree_util.tree_leaves(out)
                return c + sum(jnp.sum(l) for l in leaves) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(args, n))
        float(run(args, 4 * n))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter(); float(run(args, n))
            t1 = time.perf_counter(); float(run(args, 4 * n))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (3 * n))
        return max(best, 1e-9)

    if not args.solve_only:
        factors_all = jnp.arange(F, dtype=jnp.float32) - REF

        def f_two(seq, wx, wy, du, dv, cw):
            warped, masks = warp_stack_auto(seq, wx, wy, REF,
                                            interpret=interp)
            gated = succ_mask(masks, REF)
            return fused_data_system(warped, gated, du, dv, cw, p,
                                     interpret=interp)

        def f_merged(seq, wx, wy, du, dv, cw):
            *_, inside = _coords(wx, wy, factors_all, H, W)
            gated = succ_mask(inside.astype(jnp.float32), REF)
            return fused_warp_data(seq, wx, wy, gated, du, dv, cw, p,
                                   interpret=interp)

        # numerical sanity before timing (jit: eager op-by-op execution
        # costs ~30 ms/dispatch on the tunneled backend)
        a = jax.tree_util.tree_map(np.asarray,
                                   jax.jit(f_two)(seq1, wx, wy, du, dv, cw))
        b = jax.tree_util.tree_map(
            np.asarray, jax.jit(f_merged)(seq1, wx, wy, du, dv, cw))
        for x, y in zip(a, b):
            err = np.max(np.abs(x - y)) / (np.max(np.abs(x)) + 1e-9)
            assert err < 1e-4, err
        print("numerics: merged == two-kernel (rel < 1e-4)")

        t_two = timed(f_two, 100, seq1, wx, wy, du, dv, cw)
        t_m = timed(f_merged, 100, seq1, wx, wy, du, dv, cw)
        print(f"two-kernel data-term eval : {t_two * 1e3:7.3f} ms")
        print(f"merged data-term eval     : {t_m * 1e3:7.3f} ms"
              f"   ({t_two / t_m:.2f}x)")

    def time_solve(batch, pv, repeats=5):
        seq = jnp.asarray(np.stack(
            [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
             for s in range(batch)]))
        z = jnp.zeros((batch, H, W), jnp.float32)
        jax.block_until_ready(seq)

        def run():
            out = variational_mt_batched(z, z, seq, pv)
            return float(sum(jnp.sum(o) for o in out))

        run()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return min(times)

    if args.unroll_sweep:
        import json

        champ_path = REPO / "tools" / "solve_champion_measured.json"
        best_rec = None
        if champ_path.exists():
            with open(champ_path) as fh:
                best_rec = json.load(fh)
        best = best_rec.get("jets_per_sec", 0.0) if best_rec else 0.0
        print(f"incumbent: {best_rec} ")
        # measure at the incumbent's kernel-route flags (not bare defaults):
        # otherwise the jps comparison crosses kernel configs and a winning
        # record would silently drop the incumbent's knobs in bench.py
        route = {k: best_rec[k] for k in ("fused_solve", "self_mask",
                                          "packed_sor", "pallas_sor",
                                          "strip_r", "fuse_occ")
                 if best_rec and k in best_rec}
        for b in (int(x) for x in args.unroll_sweep.split(",")):
            pv = replace(p, merge_warp=True, jet_vmap=False,
                         unroll_jets=True, **route)
            try:
                t = time_solve(b, pv, repeats=3)
            except Exception as e:
                print(f"b{b:<2} unroll merge=1: FAILED {repr(e)[:100]}")
                continue
            jps = b / t
            print(f"b{b:<2} unroll merge=1: {t:6.3f} s/batch "
                  f"{jps:5.2f} jets/s", flush=True)
            if jps > best:
                best = jps
                # merge into the incumbent record (incumbent | new): the
                # sweep measures at the incumbent's kernel-route flags
                # (replace() above only touches batch/mode/merge_warp), so
                # knobs like fused_solve/self_mask/packed_sor recorded by
                # other tools must carry over — dropping them would silently
                # reset bench.py to defaults
                best_rec = {**(best_rec or {}),
                            "batch": b, "mode": "unroll", "merge_warp": True,
                            "jets_per_sec": round(jps, 3)}
        if best_rec is not None:
            print(f"champion: {best_rec}")
            for path in ("/tmp/solve_champion.json", str(champ_path)):
                try:
                    with open(path, "w") as fh:
                        json.dump(best_rec, fh)
                except OSError:
                    pass
        return

    if args.sweep:
        # the batched custom_vmap kernels flatten the jet batch into the
        # strip grid — larger batches amortize per-kernel latency, which the
        # roofline says dominates at 480x270 (15% VPU / 7% HBM util).
        # r4 measured: vmap batching scales worse than linear in time
        # (b4 2.83 / b8 1.97 / b16 1.36 jets/s at merge=0) — the flattened
        # strip grid loses to per-jet unrolling on the sequential-grid chip,
        # so big-batch vmap rows are dropped from the default sweep.
        best = (None, 0.0)
        for merge in (False, True):
            for mode, batches in (("unroll", (3, 4, 5, 6) if merge
                                   else (4,)), ("vmap", (4,))):
                for b in batches:
                    pv = replace(p, merge_warp=merge,
                                 jet_vmap=(mode == "vmap"),
                                 unroll_jets=(mode == "unroll"))
                    try:
                        t = time_solve(b, pv, repeats=3)
                    except Exception as e:
                        print(f"b{b:<2} {mode:6} merge={int(merge)}: "
                              f"FAILED {repr(e)[:80]}")
                        continue
                    jps = b / t
                    print(f"b{b:<2} {mode:6} merge={int(merge)}: "
                          f"{t:6.3f} s/batch {jps:5.2f} jets/s")
                    if jps > best[1]:
                        best = ((b, mode, merge), jps)
        print(f"champion: {best[0]} at {best[1]:.2f} jets/s")
        if best[0] is not None:
            import json

            b, mode, merge = best[0]
            rec = {"batch": b, "mode": mode, "merge_warp": merge,
                   "jets_per_sec": round(best[1], 3)}
            # bench.py picks this up so the driver's plain `python bench.py`
            # runs the measured-best solve configuration
            for path in ("/tmp/solve_champion.json",
                         str(REPO / "tools" / "solve_champion_measured.json")):
                try:
                    with open(path, "w") as fh:
                        json.dump(rec, fh)
                except OSError:
                    pass
        return

    if not args.phase_only:
        batch = 4
        for label, pv in (("merge_warp=False", replace(p, merge_warp=False)),
                          ("merge_warp=True ", replace(p, merge_warp=True))):
            best = time_solve(batch, pv)
            print(f"solve {label}: {best:6.3f} s/batch "
                  f"{batch / best:5.2f} jets/s")


if __name__ == "__main__":
    main()
