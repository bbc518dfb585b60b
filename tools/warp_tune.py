"""Tune the banded-warp block geometry on the live backend.

Times one 3-channel 270x480 warp per configuration with the carry-chained
fori_loop recipe (data dependence between iterations defeats CSE; the delta
run(N)-run(1) removes the ~30 ms dispatch floor of the tunneled backend —
see docs/PROFILING.md).

Usage:  python tools/warp_tune.py [N_iters]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from slowflow_tpu.core.warp import _warp_banded  # noqa: E402

H, W = 270, 480

CONFIGS = [
    # (rows, cols, x-halo, y-halo) — round-2 refinement around (32,128,16,8)
    (32, 128, 16, 8),
    (24, 128, 16, 8),
    (40, 128, 16, 8),
    (48, 128, 16, 8),
    (32, 128, 16, 4),
    (32, 128, 16, 12),
    (32, 128, 8, 8),
    (36, 128, 16, 8),
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((3, H, W)).astype(np.float32) * 255)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    wx0 = jnp.asarray(2.0 * np.sin(yy / 37) + 1.3 * np.cos(xx / 53))
    wyf = jnp.asarray(-1.5 * np.cos(xx / 41))

    ref = None
    for cfg in CONFIGS:
        def chained(k, cfg=cfg):
            def body(_, carry):
                wx, acc = carry
                out = _warp_banded(src, wx, wyf, 1.0, block_cfg=cfg)
                return wx0 + 1e-9 * out[0], acc + out[0, 0, 0]
            return jax.lax.fori_loop(0, k, body, (wx0, jnp.float32(0)))[1]

        f = jax.jit(chained, static_argnums=0)

        def run(k):
            t0 = time.perf_counter()
            float(np.asarray(f(k)))
            return time.perf_counter() - t0

        run(1); run(n)                      # compile both shapes
        t1 = min(run(1) for _ in range(3))
        tn = min(run(n) for _ in range(3))
        per = (tn - t1) / (n - 1) * 1e3

        out = np.asarray(_warp_banded(src, wx0, wyf, 1.0, block_cfg=cfg))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.abs(out - ref).max())
        blocks = int(np.ceil(H / cfg[0]) * np.ceil(min(W, cfg[1]) and
                                                   W / min(W, cfg[1])))
        print(f"R={cfg[0]:<4} T={cfg[1]:<4} Dx={cfg[2]:<3} Dy={cfg[3]:<3} "
              f"blocks={blocks:<4} {per:7.3f} ms/warp  max|Δ|={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
