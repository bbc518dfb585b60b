"""On-chip A/B of the combined occ+assembly dispatch (MultiFrameParams.
fuse_occ) at the champion config: one merged kernel per alternation produces
the occlusion data costs AND the first outer iteration's normal equations
(past/future partial sums, gate applied post-ICM in XLA), replacing the
separate occ-cost dispatch that re-warped the same frames at the same
linearization point — the ~32% occlusion share of tools/prof_solve_ablate.py.

Run: python tools/prof_occfuse.py [--batch 4] [--save PATH]
Champion promotion is gated on BOTH speed and a max-|flow-diff| numeric
check against the fuse_occ=off route.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import replace
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

H, W, REF = 270, 480, 2
F = 2 * REF + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--save", type=str, default="")
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench import _moving_sequence
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, variational_mt_batched)

    base = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                            rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                            p_scale=0.9, niter_alter=10, niter_outer=10,
                            niter_inner=1, niter_solver=30,
                            occlusion_reasoning=True, smoothing=1,
                            merge_warp=True, unroll_jets=True,
                            jet_vmap=False, fuse_occ=False)
    b = args.batch
    seq = jnp.asarray(np.stack(
        [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
         for s in range(b)]))
    z = jnp.zeros((b, H, W), jnp.float32)

    flows = {}
    occs = {}
    jps = {}
    for label, pv in (("fuse_occ=0", base),
                      ("fuse_occ=1", replace(base, fuse_occ=True))):
        def run():
            out = variational_mt_batched(z, z, seq, pv)
            float(sum(jnp.sum(o) for o in out))
            return out

        try:
            out = run()  # compile
        except Exception as e:
            print(f"{label}: FAILED {repr(e)[:160]}", flush=True)
            continue
        flows[label] = np.stack([np.asarray(out[0]), np.asarray(out[1])])
        occs[label] = np.asarray(out[2])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        jps[label] = b / t
        print(f"solve b{b} champion {label}: {t:6.3f} s/batch "
              f"{b / t:5.2f} jets/s", flush=True)

    NUMERIC_TOL = 1e-3          # px; measured bit-identical on CPU
    d = occ_d = None
    if len(flows) == 2:
        d = float(np.abs(flows["fuse_occ=1"] - flows["fuse_occ=0"]).max())
        occ_d = float((occs["fuse_occ=1"] != occs["fuse_occ=0"]).mean())
        print(f"max |flow diff| fuse_occ on/off: {d:.2e}; "
              f"occ disagree frac: {occ_d:.4f}", flush=True)
    if args.save and jps.get("fuse_occ=1", 0) > jps.get("fuse_occ=0", 1e9):
        if d is None or d > NUMERIC_TOL or occ_d > 0.01:
            print(f"NOT promoting fuse_occ champion: flow diff {d} / occ "
                  f"disagree {occ_d} out of budget", flush=True)
            return
        rec = {"batch": b, "mode": "unroll", "merge_warp": True,
               "fused_solve": True, "self_mask": True, "fuse_occ": True,
               "max_flow_diff_vs_base": d,
               "jets_per_sec": round(jps["fuse_occ=1"], 3)}
        with open(args.save, "w") as fh:
            json.dump(rec, fh)
        print(f"champion -> {args.save}: {rec}", flush=True)


if __name__ == "__main__":
    main()
