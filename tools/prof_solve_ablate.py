"""Ablate the FULL bench solve (b4 unroll merge=1) on the live chip to find
where per-jet wall time actually goes: composed-iteration microbenches
(prof_iter_composed) said a pallas SOR should save ~0.2 ms/iter, but the
full solve measured flat (tools/prof_psor.py: 2.99 vs 2.97 jets/s) — so the
solve's time is NOT a clean sum of per-iteration phase costs. Suspect:
per-level latency floors (the 4 coarse pyramid levels may cost nearly as
much per iteration as level 0 when latency- rather than area-bound).

Variants (one compile each):
  base          : champion config (5 layers, alter 10, outer 10, sor 30)
  sor1          : niter_solver=1      -> SOR's total share
  no-occ        : occlusion_reasoning=False -> occ-step share
  layers1       : layers=1            -> level-0-only cost (area scaling test)
  no-elide      : thres_outer=0       -> early-exit gain (forces all iters)
  alter1        : niter_alter=1       -> alternation-count sensitivity

Run: python tools/prof_solve_ablate.py [--batch 4]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--variants", type=str, default="",
                    help="comma-separated subset to run (default: all)")
    args = ap.parse_args()

    import jax
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
    b = args.batch
    seq = jnp.asarray(np.stack(
        [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
         for s in range(b)]))
    z = jnp.zeros((b, H, W), jnp.float32)

    variants = (
        ("base    ", base),
        ("sor1    ", replace(base, niter_solver=1)),
        ("no-occ  ", replace(base, occlusion_reasoning=False)),
        ("layers1 ", replace(base, layers=1)),
        ("no-elide", replace(base, thres_outer=0.0, thres_inner=0.0)),
        ("alter1  ", replace(base, niter_alter=1)),
        # graphc0: occ eval + argmin-energy start selection but zero ICM
        # sweeps — isolates the ICM share of the occlusion step (the no-occ
        # gap conflates occ-step cost with the alternation elision that occ
        # flicker disables)
        ("graphc0 ", replace(base, niter_graphc=0)),
    )
    only = {v.strip() for v in args.variants.split(",") if v.strip()}
    for label, pv in variants:
        if only and label.strip() not in only:
            continue

        def run():
            out = variational_mt_batched(z, z, seq, pv)
            float(sum(jnp.sum(o) for o in out))  # host fetch = barrier

        try:
            run()  # compile
        except Exception as e:
            print(f"{label}: FAILED {repr(e)[:100]}", flush=True)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{label}: {t:6.3f} s/batch  {b / t:5.2f} jets/s", flush=True)


if __name__ == "__main__":
    main()
