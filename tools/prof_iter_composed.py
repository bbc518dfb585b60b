"""Time ONE composed outer iteration (smoothness -> data-term eval ->
sub_laplacian -> SOR -> change reductions) as a chained fori on the live
chip, and ablate each piece: the isolated-phase roofline (tools/roofline.py)
misses composition costs (fusion boundaries, convergence-gate reductions,
while bookkeeping), which is where the solve's time actually goes when the
eval kernel gets fast.

Run: python tools/prof_iter_composed.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

H, W, REF = 270, 480, 2
F = 2 * REF + 1


def main():
    import jax
    import jax.numpy as jnp

    from slowflow_tpu.core.penalty import make_penalty
    from slowflow_tpu.core.solver import sor_coupled_rb
    from slowflow_tpu.core.solver_pallas import sor_coupled_rb_pallas
    from slowflow_tpu.variational.fused_warp import fused_warp_data
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, compute_smoothness_mt, compute_dpsis_weight_mt,
        succ_mask, sub_laplacian)
    from slowflow_tpu.core.warp_shift import _coords

    p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                         rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                         p_scale=0.9, niter_alter=10, niter_outer=10,
                         niter_inner=1, niter_solver=30,
                         occlusion_reasoning=True, smoothing=1)
    interp = jax.default_backend() == "cpu"
    _, _, reg_pen = p.penalties()
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255.0
    wx0 = jnp.full((H, W), 1.45, jnp.float32) \
        + jnp.asarray(rng.normal(0, 0.15, (H, W)), jnp.float32)
    wy0 = jnp.full((H, W), -0.8, jnp.float32) \
        + jnp.asarray(rng.normal(0, 0.15, (H, W)), jnp.float32)
    cw = jnp.ones((3, H, W), jnp.float32)
    dpsis = compute_dpsis_weight_mt(seq[REF], jnp.zeros(3), jnp.ones(3))
    hw = H * W

    factors_all = jnp.arange(F, dtype=jnp.float32) - REF

    def gated_of(wx, wy):
        *_, inside = _coords(wx, wy, factors_all, H, W)
        m = succ_mask(inside.astype(jnp.float32), REF)
        return m / (2.0 * sum(p.rho[s] + p.omega[s] for s in range(REF)))

    def one_iter(wx, wy, use_pallas_sor=True, solver_iters=30,
                 with_eval=True, with_sor=True, with_change=True):
        gated = gated_of(wx, wy)
        wh, wv = compute_smoothness_mt(wx, wy, dpsis, p.alpha, reg_pen,
                                       p.smoothing)
        du = jnp.zeros_like(wx)
        dv = jnp.zeros_like(wy)
        if with_eval:
            a11, a12, a22, b1, b2 = fused_warp_data(
                seq, wx, wy, gated, du, dv, cw, p, mode="assembly",
                interpret=interp)
        else:
            a11 = a22 = jnp.ones_like(wx) + wx * 1e-9
            a12 = jnp.zeros_like(wx)
            b1 = wx * 0.01
            b2 = wy * 0.01
        b1 = sub_laplacian(b1, wx, wh, wv)
        b2 = sub_laplacian(b2, wy, wh, wv)
        if with_sor:
            sor = sor_coupled_rb_pallas if use_pallas_sor else sor_coupled_rb
            ndu, ndv = sor(du, dv, a11, a12, a22, b1, b2, wh, wv,
                           iterations=solver_iters, omega=p.sor_omega)
        else:
            ndu, ndv = b1 * 0.1, b2 * 0.1
        uu = wx + ndu
        vv = wy + ndv
        if with_change:
            change = jnp.maximum(jnp.abs(ndu).sum(), jnp.abs(ndv).sum()) / hw
            keep = (change > -1.0)
            uu = jnp.where(keep, uu, wx)
            vv = jnp.where(keep, vv, wy)
        # keep the chain bounded so values stay finite across n iters
        uu = wx0 + 0.01 * (uu - wx0)
        vv = wy0 + 0.01 * (vv - wy0)
        return uu, vv

    def timed(fn, n):
        @partial(jax.jit, static_argnames="n")
        def go(a, n):
            def body(i, c):
                wx, wy = fn(c[0], c[1])
                return (wx, wy)
            return jax.lax.fori_loop(0, n, body, a)
        args = (wx0, wy0)
        jax.block_until_ready(go(args, n))
        jax.block_until_ready(go(args, 4 * n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(go(args, n))
            t1 = time.perf_counter()
            jax.block_until_ready(go(args, 4 * n))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (3 * n))
        return best

    variants = {
        "full (pallas sor)": dict(),
        "full (xla sor)": dict(use_pallas_sor=False),
        "no eval": dict(with_eval=False),
        "no sor": dict(with_sor=False),
        "sor iters 1": dict(solver_iters=1),
        "no change-red": dict(with_change=False),
    }
    for name, kw in variants.items():
        t = timed(lambda wx, wy, kw=kw: one_iter(wx, wy, **kw), 100)
        print(f"{name:20s}: {t*1e3:7.3f} ms/iter")


if __name__ == "__main__":
    main()
