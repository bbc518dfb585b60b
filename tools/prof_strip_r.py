"""On-chip sweep of the merged kernel's strip height (MultiFrameParams.
strip_r) inside the FULL champion solve. The data-term eval is ~46% of an
outer iteration and its grid runs H/r sequential strips per dispatch; the
warp-variant ladder fits on GLOBAL spans, so r only trades per-step latency
against per-strip VMEM.

Run: python tools/prof_strip_r.py [--rs 32,64,96] [--batch 4]
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
    ap.add_argument("--rs", type=str, default="32,64,96")
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

    best = None
    ref_flow = None
    for r in [int(x) for x in args.rs.split(",")]:
        pv = base if r == 32 else replace(base, strip_r=r)

        def run():
            out = variational_mt_batched(z, z, seq, pv)
            float(sum(jnp.sum(o) for o in out))
            return out

        try:
            out = run()  # compile
        except Exception as e:
            print(f"r={r}: FAILED {repr(e)[:140]}", flush=True)
            continue
        flow = np.stack([np.asarray(out[0]), np.asarray(out[1])])
        if ref_flow is None:
            ref_flow = flow
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        d = np.abs(flow - ref_flow).max()
        print(f"r={r}: {t:6.3f} s/batch {b / t:5.2f} jets/s "
              f"(|dflow| vs r32: {d:.2e})", flush=True)
        if best is None or b / t > best["jets_per_sec"]:
            best = {"batch": b, "mode": "unroll", "merge_warp": True,
                    "fused_solve": True, "strip_r": r,
                    "jets_per_sec": round(b / t, 3)}
    if args.save and best:
        with open(args.save, "w") as fh:
            json.dump(best, fh)
        print(f"champion -> {args.save}: {best}", flush=True)


if __name__ == "__main__":
    main()
