"""Isolate the 8-bit input-quantization floor of the pipeline flow error.

bench.py's kernel metric recovers the bench scene to 0.002 px from FLOAT
frames, while the CLI pipeline measures ~0.093 px on the same scene written
through 8-bit PNGs. This A/B runs the identical champion solve on (a) the
float frames and (b) the same frames rounded to uint8, isolating the
quantization contribution from everything else in the pipeline.

Run: python tools/prof_quant.py
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

H, W, REF = 270, 480, 2
F = 2 * REF + 1


def main():
    import jax.numpy as jnp

    from bench import _moving_sequence
    from slowflow_tpu.core.image import normalize_sequence
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, variational_mt_batched)

    p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                         rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                         p_scale=0.9, niter_alter=10, niter_outer=10,
                         niter_inner=1, niter_solver=30,
                         occlusion_reasoning=True, smoothing=1)
    seq = _moving_sequence(F, H, W, 1.5, -0.8, seed=0)

    out = {}
    for label, frames in (("float", seq),
                          ("uint8", np.round(seq).astype(np.uint8)
                           .astype(np.float32))):
        stack, avg, std = normalize_sequence(frames)
        z = jnp.zeros((1, H, W), jnp.float32)
        na = jnp.asarray(avg, jnp.float32)[None]
        ns = jnp.asarray(std, jnp.float32)[None]
        wx, wy, _ = variational_mt_batched(
            z, z, jnp.asarray(stack)[None], p,
            jnp.ones((1, 3, H, W), jnp.float32), na, ns)
        inner = (slice(12, -12), slice(12, -12))
        err = np.hypot(np.asarray(wx)[0][inner] - 1.5,
                       np.asarray(wy)[0][inner] + 0.8)
        out[label] = round(float(np.median(err)), 4)
        print(f"{label:6}: median flow err {out[label]} px", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
