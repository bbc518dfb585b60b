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


def _packed_rb_sweeps(ndu_ref, ndv_ref, wh, wv, i11, i12, i22, h, w,
                      du0, dv0, *, iterations: int, omega: float):
    """Checkerboard-PACKED red-black SOR: each color's cells live in a dense
    [H, W/2] plane, so every half-sweep computes only the updated color's
    arithmetic (the masked full-width formulation computes both colors and
    discards half). Per-cell expressions, operand order, and the
    red-then-black schedule are identical to the masked path — results
    match to FMA-contraction noise (~1 ulp/sweep; the compiler fuses
    multiply-adds differently across the two expression trees).
    Packing convention: color plane col i2 holds image col
    2*i2 + offset, offset 0 on even rows for red (1 for black) and swapped
    on odd rows; vertical neighbours then share the packed column, and
    west/east neighbours are a row-parity select between the neighbour
    plane and its one-column shift."""
    from jax.experimental.pallas import tpu as pltpu

    w2 = w // 2
    # lane-aligned packed width: the 240-wide (1.875 lane-tile) packed
    # planes CHECK-crashed the Mosaic compiler; padding the packed axis to
    # a lane multiple is mathematically transparent — the one-hot selectors
    # are identically zero in the pad region (2*i2 >= w there), the edge
    # masks stop any pad->live flow through the rolls, and the packed
    # i11/i12/i22 pads are exactly zero so the du/dv carries stay 0 in the
    # pads (all values finite; no 0*inf hazards)
    w2p = -(-w2 // 128) * 128
    rowp = jax.lax.broadcasted_iota(jnp.int32, (h, w2p), 0)
    even = (rowp % 2 == 0)

    # de/interleave via one-hot selection matmuls — Mosaic has no lane-
    # strided slice (it lowers to an unsupported gather), but a [w, w2p]
    # 0/1 matrix on the MXU is exact at HIGHEST precision (each output is
    # one value plus zeros) and costs microseconds
    wi = jax.lax.broadcasted_iota(jnp.int32, (w, w2p), 0)
    w2i = jax.lax.broadcasted_iota(jnp.int32, (w, w2p), 1)
    s_even = (wi == 2 * w2i).astype(jnp.float32)
    s_odd = (wi == 2 * w2i + 1).astype(jnp.float32)
    # transposed selectors built directly from iota (no in-kernel transpose)
    w2j = jax.lax.broadcasted_iota(jnp.int32, (w2p, w), 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (w2p, w), 1)
    s_even_t = (wj == 2 * w2j).astype(jnp.float32)
    s_odd_t = (wj == 2 * w2j + 1).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    def pack(x):
        a = jnp.dot(x, s_even, precision=hi)       # even image cols
        b = jnp.dot(x, s_odd, precision=hi)        # odd image cols
        return jnp.where(even, a, b), jnp.where(even, b, a)

    def unpack(xr, xb):
        a = jnp.where(even, xr, xb)        # even image cols
        b = jnp.where(even, xb, xr)        # odd image cols
        return jnp.dot(a, s_even_t, precision=hi) \
            + jnp.dot(b, s_odd_t, precision=hi)

    def north0p(x):
        return jnp.where(rowp == 0, 0.0,
                         pltpu.roll(x, shift=1, axis=0))

    def south0p(x):
        return jnp.where(rowp == h - 1, 0.0,
                         pltpu.roll(x, shift=h - 1, axis=0))

    col2 = jax.lax.broadcasted_iota(jnp.int32, (h, w2p), 1)

    def west0p(x):
        return jnp.where(col2 == 0, 0.0, pltpu.roll(x, shift=1, axis=1))

    def east0p(x):
        return jnp.where(col2 >= w2 - 1, 0.0,
                         pltpu.roll(x, shift=w2p - 1, axis=1))

    whR, whB = pack(wh)
    wvR, wvB = pack(wv)
    i11R, i11B = pack(i11)
    i12R, i12B = pack(i12)
    i22R, i22B = pack(i22)
    # the packed RHS stays as stack values: half-slice reads of the output
    # blocks at lane offset w2 (not a multiple of 128) CHECK-crash the
    # Mosaic compiler; the packed pairs cost the same stack as the full
    # planes while the du/dv carries are now half-size
    B1R, B1B = pack(ndu_ref[0])
    B2R, B2B = pack(ndv_ref[0])
    if du0 is None:
        duR = duB = dvR = dvB = jnp.zeros((h, w2p), jnp.float32)
    else:
        duR, duB = pack(du0)
        dvR, dvB = pack(dv0)

    def half(uS, vS, uN, vN, whS, wvS, wvN, whN, i11S, i12S, i22S, B1S, B2S,
             red_upd: bool):
        """Update color S (self) from color N (neighbour plane)."""
        # west neighbour of S sits one packed col left on rows where S's
        # image col is even (even rows for red, odd rows for black)
        sel_w = even if red_upd else jnp.logical_not(even)

        def lat(xN, wN_own):
            wxa = whN * xN                       # weight at the neighbour
            westt = jnp.where(sel_w, west0p(wxa), wxa)
            eastt = wN_own * jnp.where(sel_w, xN, east0p(xN))
            return westt, eastt

        su_w, su_e = lat(uN, whS)
        sv_w, sv_e = lat(vN, whS)
        su = north0p(wvN * uN) + su_w + wvS * south0p(uN) + su_e
        sv = north0p(wvN * vN) + sv_w + wvS * south0p(vN) + sv_e
        B1 = B1S + su
        B2 = B2S + sv
        nu = i11S * B1 + i12S * B2
        nv = i12S * B1 + i22S * B2
        uS = (1 - omega) * uS + omega * nu
        vS = (1 - omega) * vS + omega * nv
        return uS, vS

    def body(_, carry):
        duR, duB, dvR, dvB = carry
        duR, dvR = half(duR, dvR, duB, dvB, whR, wvR, wvB, whB,
                        i11R, i12R, i22R, B1R, B2R, True)
        duB, dvB = half(duB, dvB, duR, dvR, whB, wvB, wvR, whR,
                        i11B, i12B, i22B, B1B, B2B, False)
        return duR, duB, dvR, dvB

    duR, duB, dvR, dvB = jax.lax.fori_loop(
        0, iterations, body, (duR, duB, dvR, dvB))
    return unpack(duR, duB), unpack(dvR, dvB)


def _solve_kernel(uu_ref, vv_ref, dpsis_ref, a11_ref, a12_ref, a22_ref,
                  b1_ref, b2_ref, *rest, alpha: float, reg_pen, method: int,
                  iterations: int, omega: float, zero_init: bool,
                  with_change: bool, packed_rb: bool = False):
    """rest is (du_ref, dv_ref, ndu_ref, ndv_ref), or (ndu_ref, ndv_ref)
    when zero_init (the production niter_inner==1 case: the solver always
    starts from du = dv = 0, so the operands are dropped entirely — inside
    the solve's while-loops XLA keeps every operand plane VMEM-resident, and
    the ~18 MB scoped budget is shared between those blocks and the kernel
    stack). with_change appends an SMEM (1, 2) output holding
    (sum|du|, sum|dv|) so the caller's convergence gate needs no plane
    reductions of its own."""
    from jax.experimental.pallas import tpu as pltpu

    if with_change:
        *rest, s_ref = rest
    if zero_init:
        ndu_ref, ndv_ref = rest
        du_ref = dv_ref = None
    else:
        du_ref, dv_ref, ndu_ref, ndv_ref = rest

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
        # accumulate the squared-gradient sums term by term (each term's
        # temporaries die immediately) — the kernel must stay under the
        # default ~18 MB scoped-VMEM stack at 480x270
        hsq = ux1 * ux1 + vx1 * vx1
        vsq = uy1 * uy1 + vy1 * vy1
        if method == 1:
            # DERIV_3PT central difference, edge-clamped
            uy2 = 0.5 * (south_c(uu) - north_c(uu))
            th = 0.5 * (uy2 + east_c(uy2))
            hsq = hsq + th * th
            vy2 = 0.5 * (south_c(vv) - north_c(vv))
            th = 0.5 * (vy2 + east_c(vy2))
            hsq = hsq + th * th
            ux2 = 0.5 * (east_c(uu) - west_c(uu))
            tv = 0.5 * (ux2 + south_c(ux2))
            vsq = vsq + tv * tv
            vx2 = 0.5 * (east_c(vv) - west_c(vv))
            tv = 0.5 * (vx2 + south_c(vx2))
            vsq = vsq + tv * tv
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

    # park the adjusted RHS in the OUTPUT blocks during the sweep loop (they
    # are dead until the final du/dv store) — two planes off the VMEM stack
    ndu_ref[0] = sub_lap(b1_ref[0], uu)
    ndv_ref[0] = sub_lap(b2_ref[0], vv)

    # ---- coupled red-black SOR (solver.c:17-57 fixed point) ----
    # the shifted neighbour weights are never materialized: w_n*north0(x)
    # == north0(wv*x) exactly (shift of product = product of shifts), which
    # keeps two planes off the persistent VMEM stack
    sum_w = north0(wv) + west0(wh) + wv + wh
    A11 = a11_ref[0] + sum_w
    A22 = a22_ref[0] + sum_w
    a12 = a12_ref[0]
    det = A11 * A22 - a12 * a12
    det = jnp.where(det == 0, 1.0, det)
    i11 = A22 / det
    i12 = -a12 / det
    i22 = A11 / det

    if packed_rb and w % 2 == 0:
        du, dv = _packed_rb_sweeps(
            ndu_ref, ndv_ref, wh, wv, i11, i12, i22, h, w,
            None if zero_init else du_ref[0],
            None if zero_init else dv_ref[0],
            iterations=iterations, omega=omega)
    else:
        red = ((row + col) % 2 == 0)

        def half(du, dv, mask):
            su = north0(wv * du) + west0(wh * du) + wv * south0(du) \
                + wh * east0(du)
            sv = north0(wv * dv) + west0(wh * dv) + wv * south0(dv) \
                + wh * east0(dv)
            B1 = ndu_ref[0] + su
            B2 = ndv_ref[0] + sv
            nu = i11 * B1 + i12 * B2
            nv = i12 * B1 + i22 * B2
            du = jnp.where(mask, (1 - omega) * du + omega * nu, du)
            dv = jnp.where(mask, (1 - omega) * dv + omega * nv, dv)
            return du, dv

        def body(_, carry):
            du, dv = carry
            du, dv = half(du, dv, red)
            du, dv = half(du, dv, jnp.logical_not(red))
            return du, dv

        if zero_init:
            init = (jnp.zeros_like(uu), jnp.zeros_like(uu))
        else:
            init = (du_ref[0], dv_ref[0])
        du, dv = jax.lax.fori_loop(0, iterations, body, init)
    ndu_ref[0] = du
    ndv_ref[0] = dv
    if with_change:
        s_ref[0, 0, 0] = jnp.sum(jnp.abs(du))
        s_ref[0, 0, 1] = jnp.sum(jnp.abs(dv))


def fused_solve_step_batched(uu, vv, dpsis, a11, a12, a22, b1, b2,
                             du=None, dv=None, *, alpha: float, reg_pen,
                             method: int, iterations: int, omega: float,
                             interpret: bool = False,
                             with_change: bool = False,
                             packed_rb: bool = False):
    """Batched fused solve step. All inputs [B, H, W] f32; returns
    (ndu, ndv) [B, H, W] — bit-compatible with
    compute_smoothness_mt + 2x sub_laplacian + sor_coupled_rb.

    du/dv may be None (the production niter_inner==1 case): the sweep then
    starts from zeros materialized in-kernel, two operand planes fewer.
    Memory discipline: inside the solve's while-loops XLA holds every
    operand/result plane of this call VMEM-resident, sharing the ~18 MB
    scoped budget with the kernel stack — hence the dropped operands, the
    RHS parked in the output blocks, the shifted-weight planes folded into
    the sweep products, and the term-by-term smoothness accumulation.
    (Raising vmem_limit_bytes to
    100 MB instead made the full 4-jet x 5-level program SIGSEGV the remote
    Mosaic compiler — keep the kernel lean rather than the limit high.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    zero_init = du is None
    b, h, w = uu.shape
    # packed_rb history: the first (unpadded, 240-wide) packed formulation
    # CHECK-crashed the TPU compiler ("array.h:480 limits[i] <= dim(i)
    # (2 vs 1)"); padding the packed axis to a lane multiple (see
    # _packed_rb_sweeps) fixed the crash. tools/prof_packed.py is the A/B.
    kernel = partial(_solve_kernel, alpha=float(alpha), reg_pen=reg_pen,
                     method=int(method), iterations=int(iterations),
                     omega=float(omega), zero_init=zero_init,
                     with_change=with_change, packed_rb=packed_rb)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    args = (uu, vv, dpsis, a11, a12, a22, b1, b2) \
        + (() if zero_init else (du, dv))
    out_shape = [jax.ShapeDtypeStruct((b, h, w), uu.dtype),
                 jax.ShapeDtypeStruct((b, h, w), uu.dtype)]
    out_specs = [spec, spec]
    if with_change:
        # Mosaic's block rule needs the last two dims to equal the array's
        # (or be tile multiples): a (1, 1, 2) block over (b, 1, 2) is legal
        # for any batch, unlike (1, 2) over (b, 2)
        out_shape.append(jax.ShapeDtypeStruct((b, 1, 2), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                                      memory_space=pltpu.SMEM))
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=tuple(out_shape),
        in_specs=[spec] * len(args),
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)
    if with_change:
        outs = (outs[0], outs[1], outs[2].reshape(b, 2))
    return outs


def fused_solve_step(uu, vv, dpsis, a11, a12, a22, b1, b2, du=None, dv=None,
                     *, alpha: float, reg_pen, method: int, iterations: int,
                     omega: float, interpret: bool = False,
                     with_change: bool = False, packed_rb: bool = False):
    """Single-jet fused solve step (see fused_solve_step_batched)."""
    outs = fused_solve_step_batched(
        uu[None], vv[None], dpsis[None], a11[None], a12[None], a22[None],
        b1[None], b2[None], None if du is None else du[None],
        None if dv is None else dv[None], alpha=alpha,
        reg_pen=reg_pen, method=method, iterations=iterations, omega=omega,
        interpret=interpret, with_change=with_change, packed_rb=packed_rb)
    return tuple(o[0] for o in outs)
