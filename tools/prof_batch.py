"""Unrolled-jet batch-size sweep on the live chip with the current champion
kernel route (merge_warp + zero_duv elision). The round-3/4 sweeps only
tested b4 unroll; vmap scaled worse than linear (b8 1.97, b16 1.36 jets/s)
but unrolling keeps per-jet grids sequential, so larger unrolled batches may
still amortize the per-alternation latency floor the solve ablation exposed
(tools/prof_solve_ablate.py: measured solve ~5x the composed-iteration sum).

Run: python tools/prof_batch.py [--batches 4,6,8]
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
    ap.add_argument("--batches", type=str, default="4,6,8")
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
                            jet_vmap=False, pallas_sor=False)
    best = None
    for b in [int(x) for x in args.batches.split(",")]:
        seq = jnp.asarray(np.stack(
            [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
             for s in range(b)]))
        z = jnp.zeros((b, H, W), jnp.float32)

        def run():
            out = variational_mt_batched(z, z, seq, base)
            float(sum(jnp.sum(o) for o in out))

        t0 = time.perf_counter()
        run()  # compile
        tc = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"b{b} unroll merge=1: {t:6.3f} s/batch {b / t:5.2f} jets/s "
              f"(compile {tc:.0f}s)", flush=True)
        if best is None or b / t > best["jets_per_sec"]:
            best = {"batch": b, "mode": "unroll", "merge_warp": True,
                    "jets_per_sec": round(b / t, 3)}
    if args.save and best:
        with open(args.save, "w") as fh:
            json.dump(best, fh)
        print(f"champion -> {args.save}: {best}", flush=True)


if __name__ == "__main__":
    main()
