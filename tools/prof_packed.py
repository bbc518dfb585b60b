"""On-chip A/B of checkerboard-PACKED red-black sweeps inside the fused
solve kernel (MultiFrameParams.packed_sor) at the champion config: the
masked formulation computes both colors' full-width update math every
half-sweep and discards half; packing makes the updated color dense in
[H, W/2] with a bit-identical fixed point.

Run: python tools/prof_packed.py [--batch 4]
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
                            jet_vmap=False)
    b = args.batch
    seq = jnp.asarray(np.stack(
        [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
         for s in range(b)]))
    z = jnp.zeros((b, H, W), jnp.float32)

    flows = {}
    jps = {}
    for label, pv in (("packed=0", base),
                      ("packed=1", replace(base, packed_sor=True))):
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
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        jps[label] = b / t
        print(f"solve b{b} champion {label}: {t:6.3f} s/batch "
              f"{b / t:5.2f} jets/s", flush=True)

    # NUMERIC gate before any champion promotion: compiled-vs-compiled
    # packed numerics rest entirely on this A/B (CI validates the packed
    # path in interpret mode only), so a chip-side regression must not be
    # promotable on speed alone
    NUMERIC_TOL = 1e-3          # px; packed RB is bit-identical in theory,
    #                             ~1 ulp/sweep in practice
    d = None
    if len(flows) == 2:
        d = float(np.abs(flows["packed=1"] - flows["packed=0"]).max())
        print(f"max |flow diff| packed on/off: {d:.2e}", flush=True)
    if args.save and jps.get("packed=1", 0) > jps.get("packed=0", 1e9):
        if d is None or d > NUMERIC_TOL:
            print(f"NOT promoting packed champion: max |flow diff| "
                  f"{d} exceeds {NUMERIC_TOL} (or baseline failed)",
                  flush=True)
            return
        rec = {"batch": b, "mode": "unroll", "merge_warp": True,
               "fused_solve": True, "self_mask": True, "packed_sor": True,
               "max_flow_diff_vs_masked": d,
               "jets_per_sec": round(jps["packed=1"], 3)}
        with open(args.save, "w") as fh:
            json.dump(rec, fh)
        print(f"champion -> {args.save}: {rec}", flush=True)


if __name__ == "__main__":
    main()
