"""Pallas TPU kernel: fused smoothness + laplacian + coupled SOR solve step.

One outer iteration of the continuous minimization (variational_mt.cpp:
169-290) is, after the data-term assembly: edge-aware smoothness weights
(variational_aux_mt.cpp:18-127), two sub_laplacian right-hand-side
adjustments (variational_aux_mt.cpp:130-161), and 30 coupled red-black SOR
sweeps (solver.c:17-57). Run as separate XLA ops these cost ~0.34 ms
composed at 480x270 versus ~0.19 ms as an isolated sum (docs/PROFILING.md:
the composed outer iteration is not a clean sum of phase costs — each op
boundary pays an HBM round-trip for every plane plus scheduling latency on
a latency-bound workload at 15% VPU utilization).

This kernel runs the whole post-assembly solve step in ONE program with
every plane VMEM-resident: inputs (uu, vv, dpsis, a11, a12, a22, b1, b2,
du, dv) are read from HBM once, (ndu, ndv) written once; the smoothness
stencils, the RHS divergence adjustment, the 2x2 diagonal-block inversion,
and all `iterations` red-black half-sweep pairs happen on VMEM values.
Numerics are identical to the XLA path (same formulas, same edge masking —
tests/test_fused_solve.py pins equivalence on all three smoothing methods).

Grid: one program per batch element, like core/solver_pallas.py. The jet
batch therefore flattens into the grid and the kernel batches natively
(multiframe._fused_solve_cv wraps it in custom_vmap).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

VMEM_BUDGET_BYTES = 100 * 1024 * 1024


def fits_vmem(h: int, w: int) -> bool:
    # 12 io blocks + ~20 live temporaries at peak, f32
    return 32 * h * w * 4 < VMEM_BUDGET_BYTES


def _solve_kernel(uu_ref, vv_ref, dpsis_ref, a11_ref, a12_ref, a22_ref,
                  b1_ref, b2_ref, du_ref, dv_ref, ndu_ref, ndv_ref, *,
                  alpha: float, reg_pen, method: int, iterations: int,
                  omega: float):
    from jax.experimental.pallas import tpu as pltpu

    uu = uu_ref[0]
    vv = vv_ref[0]
    dpsis = dpsis_ref[0]
    h, w = uu.shape

    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    # ---- shifted views (pltpu.roll + boundary masks; no gathers) ----
    def east0(x):          # x[j, i+1], 0 past the edge
        return jnp.where(col == w - 1, 0.0, pltpu.roll(x, shift=w - 1, axis=1))

    def west0(x):
        return jnp.where(col == 0, 0.0, pltpu.roll(x, shift=1, axis=1))

    def south0(x):
        return jnp.where(row == h - 1, 0.0, pltpu.roll(x, shift=h - 1, axis=0))

    def north0(x):
        return jnp.where(row == 0, 0.0, pltpu.roll(x, shift=1, axis=0))

    def east_c(x):         # x[j, min(i+1, w-1)] (edge replicate)
        return jnp.where(col == w - 1, x, pltpu.roll(x, shift=w - 1, axis=1))

    def west_c(x):
        return jnp.where(col == 0, x, pltpu.roll(x, shift=1, axis=1))

    def south_c(x):
        return jnp.where(row == h - 1, x, pltpu.roll(x, shift=h - 1, axis=0))

    def north_c(x):
        return jnp.where(row == 0, x, pltpu.roll(x, shift=1, axis=0))

    # ---- smoothness weights (compute_smoothness_mt semantics) ----
    ux1 = jnp.where(col == w - 1, 0.0, east_c(uu) - uu)
    vx1 = jnp.where(col == w - 1, 0.0, east_c(vv) - vv)
    uy1 = jnp.where(row == h - 1, 0.0, south_c(uu) - uu)
    vy1 = jnp.where(row == h - 1, 0.0, south_c(vv) - vv)

    if method <= 1:
        if method == 1:
            # DERIV_3PT central difference, edge-clamped
            ux2 = 0.5 * (east_c(uu) - west_c(uu))
            vx2 = 0.5 * (east_c(vv) - west_c(vv))
            uy2 = 0.5 * (south_c(uu) - north_c(uu))
            vy2 = 0.5 * (south_c(vv) - north_c(vv))
            th_u = 0.5 * (uy2 + east_c(uy2))
            th_v = 0.5 * (vy2 + east_c(vy2))
            tv_u = 0.5 * (ux2 + south_c(ux2))
            tv_v = 0.5 * (vx2 + south_c(vx2))
            hsq = ux1 * ux1 + th_u * th_u + vx1 * vx1 + th_v * th_v
            vsq = uy1 * uy1 + tv_u * tv_u + vy1 * vy1 + tv_v * tv_v
        else:
            hsq = ux1 * ux1 + vx1 * vx1
            vsq = uy1 * uy1 + vy1 * vy1
        wh = (dpsis + east_c(dpsis)) * alpha * reg_pen.derivative(hsq)
        wv = (dpsis + south_c(dpsis)) * alpha * reg_pen.derivative(vsq)
    else:
        has_e = col < w - 1
        has_s = row < h - 1
        sq = jnp.where(has_e, ux1 * ux1 + vx1 * vx1, 0.0) \
            + jnp.where(has_s, uy1 * uy1 + vy1 * vy1, 0.0)
        wsum = dpsis + jnp.where(has_e, east_c(dpsis), 0.0) \
            + jnp.where(has_s, south_c(dpsis), 0.0)
        wh = wv = wsum * alpha * reg_pen.derivative(sq)

    wh = jnp.where(col == w - 1, 0.0, wh)
    wv = jnp.where(row == h - 1, 0.0, wv)

    # ---- sub_laplacian RHS adjustment: b += div(w grad src) ----
    def sub_lap(dst, src):
        th = wh * (east_c(src) - src)          # wh already 0 on last col
        dst = dst + th - west0(th)
        tv = wv * (south_c(src) - src)
        dst = dst + tv - north0(tv)
        return dst

    b1 = sub_lap(b1_ref[0], uu)
    b2 = sub_lap(b2_ref[0], vv)

    # ---- coupled red-black SOR (solver.c:17-57 fixed point) ----
    w_n = north0(wv)
    w_w = west0(wh)
    sum_w = w_n + w_w + wv + wh
    A11 = a11_ref[0] + sum_w
    A22 = a22_ref[0] + sum_w
    a12 = a12_ref[0]
    det = A11 * A22 - a12 * a12
    det = jnp.where(det == 0, 1.0, det)
    i11 = A22 / det
    i12 = -a12 / det
    i22 = A11 / det

    red = ((row + col) % 2 == 0)
    black = jnp.logical_not(red)

    def half(du, dv, mask):
        su = w_n * north0(du) + w_w * west0(du) + wv * south0(du) \
            + wh * east0(du)
        sv = w_n * north0(dv) + w_w * west0(dv) + wv * south0(dv) \
            + wh * east0(dv)
        B1 = b1 + su
        B2 = b2 + sv
        nu = i11 * B1 + i12 * B2
        nv = i12 * B1 + i22 * B2
        du = jnp.where(mask, (1 - omega) * du + omega * nu, du)
        dv = jnp.where(mask, (1 - omega) * dv + omega * nv, dv)
        return du, dv

    def body(_, carry):
        du, dv = carry
        du, dv = half(du, dv, red)
        du, dv = half(du, dv, black)
        return du, dv

    du, dv = jax.lax.fori_loop(0, iterations, body, (du_ref[0], dv_ref[0]))
    ndu_ref[0] = du
    ndv_ref[0] = dv


def fused_solve_step_batched(uu, vv, dpsis, a11, a12, a22, b1, b2, du, dv,
                             *, alpha: float, reg_pen, method: int,
                             iterations: int, omega: float,
                             interpret: bool = False):
    """Batched fused solve step. All inputs [B, H, W] f32; returns
    (ndu, ndv) [B, H, W] — bit-compatible with
    compute_smoothness_mt + 2x sub_laplacian + sor_coupled_rb."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = uu.shape
    kernel = partial(_solve_kernel, alpha=float(alpha), reg_pen=reg_pen,
                     method=int(method), iterations=int(iterations),
                     omega=float(omega))
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_du, out_dv = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), uu.dtype),
                   jax.ShapeDtypeStruct((b, h, w), uu.dtype)),
        in_specs=[spec] * 10,
        out_specs=(spec, spec),
        interpret=interpret,
    )(uu, vv, dpsis, a11, a12, a22, b1, b2, du, dv)
    return out_du, out_dv


def fused_solve_step(uu, vv, dpsis, a11, a12, a22, b1, b2, du, dv, *,
                     alpha: float, reg_pen, method: int, iterations: int,
                     omega: float, interpret: bool = False):
    """Single-jet fused solve step (see fused_solve_step_batched)."""
    outs = fused_solve_step_batched(
        uu[None], vv[None], dpsis[None], a11[None], a12[None], a22[None],
        b1[None], b2[None], du[None], dv[None], alpha=alpha,
        reg_pen=reg_pen, method=method, iterations=iterations, omega=omega,
        interpret=interpret)
    return tuple(o[0] for o in outs)
