"""How much do the convergence exits (iteration elision) actually save at
the bench config, and how does the vmapped batched-kernel path compare to
the per-jet unroll today?

Runs the exact bench.py workload (two-layer occlusion scene, full
cfgs/slow_flow.cfg iteration counts) in three variants:
  A. defaults           (thres 1e-5, unrolled batch)    — the bench path
  B. thresholds zeroed  (every loop runs to its cap)    — elision off
  C. jet_vmap           (batched Pallas kernels, synced convergence)
"""
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _moving_sequence
from slowflow_tpu.variational.multiframe import (MultiFrameParams,
                                                 variational_mt_batched)

H, W, BATCH = 270, 480, 4

p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                     rho=(1.0, 1.0), omega=(0.0, 2.0),
                     layers=5, p_scale=0.9,
                     niter_alter=10, niter_outer=10, niter_inner=1,
                     niter_solver=30, occlusion_reasoning=True, smoothing=1)

f = 2 * p.ref + 1
seq = jnp.asarray(np.stack(
    [_moving_sequence(f, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
     for s in range(BATCH)]))
wx = jnp.zeros((BATCH, H, W), jnp.float32)
wy = jnp.zeros((BATCH, H, W), jnp.float32)
jax.block_until_ready(seq)


def measure(pv, label, repeats=5):
    def run():
        out = variational_mt_batched(wx, wy, seq, pv)
        return float(sum(jnp.sum(o) for o in out))

    run()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:34s} {best:7.3f} s/batch  {BATCH / best:5.2f} jets/s")
    return best


measure(p, "A. defaults (unroll, elision on)")
measure(replace(p, thres_outer=0.0, thres_inner=0.0),
        "B. thresholds zeroed (no elision)")
measure(replace(p, jet_vmap=True), "C. jet_vmap (batched kernels)")
measure(replace(p, jet_vmap=True, thres_outer=0.0, thres_inner=0.0),
        "D. jet_vmap, no elision")
