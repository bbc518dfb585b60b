"""Pallas TPU kernel: fused red-black coupled SOR.

The XLA version (`core.solver.sor_coupled_rb`) streams ~10 planes through HBM
on every half-sweep (60 half-sweeps per solve at the default 30 iterations).
This kernel keeps du/dv, the inverted 2x2 diagonal blocks, the right-hand
side, and the four neighbour weights resident in VMEM for the *entire*
iteration loop — one HBM round-trip total instead of one per sweep.

Grid: one program per batch element (each jet's level fits VMEM at the
pipeline's working resolutions: 11 planes * H*W * 4B; 480x270 -> ~5.7 MB).
Shifts inside the kernel are pltpu.roll + boundary masking (pure vector ops;
no gathers).

Caveat: `jax.vmap` of this pallas_call stages the mapped axis *into* the VMEM
blocks rather than the grid, so inside a vmapped pipeline the kernel only
fits for small batch*H*W products (MultiFrameParams.pallas_sor opts in; the
XLA red-black path remains the default and is the fallback).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

VMEM_BUDGET_BYTES = 100 * 1024 * 1024  # conservative cap incl. temporaries


def _fits_vmem(h: int, w: int) -> bool:
    return 14 * h * w * 4 < VMEM_BUDGET_BYTES


def _sor_kernel(du_ref, dv_ref, i11_ref, i12_ref, i22_ref, b1_ref, b2_ref,
                wn_ref, ww_ref, ws_ref, we_ref, out_du_ref, out_dv_ref,
                *, iterations: int, omega: float):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    h, w = du_ref.shape[-2], du_ref.shape[-1]
    i11 = i11_ref[0]
    i12 = i12_ref[0]
    i22 = i22_ref[0]
    b1 = b1_ref[0]
    b2 = b2_ref[0]
    wn = wn_ref[0]
    ww = ww_ref[0]
    ws = ws_ref[0]
    we = we_ref[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    red = ((row + col) % 2 == 0)
    black = jnp.logical_not(red)

    def north(x):
        return jnp.where(row == 0, 0.0, pltpu.roll(x, shift=1, axis=0))

    def south(x):
        # pltpu.roll requires non-negative shifts; h-1 == -1 circularly
        return jnp.where(row == h - 1, 0.0, pltpu.roll(x, shift=h - 1, axis=0))

    def west(x):
        return jnp.where(col == 0, 0.0, pltpu.roll(x, shift=1, axis=1))

    def east(x):
        return jnp.where(col == w - 1, 0.0, pltpu.roll(x, shift=w - 1, axis=1))

    def half(du, dv, mask):
        su = wn * north(du) + ww * west(du) + ws * south(du) + we * east(du)
        sv = wn * north(dv) + ww * west(dv) + ws * south(dv) + we * east(dv)
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
    out_du_ref[0] = du
    out_dv_ref[0] = dv


@partial(jax.jit, static_argnames=("iterations", "omega"))
def sor_coupled_rb_pallas(du, dv, a11, a12, a22, b1, b2, wh, wv,
                          iterations: int = 30, omega: float = 1.9):
    """Drop-in replacement for `sor_coupled_rb` backed by the fused kernel.

    Same system semantics (solver.c:17-57): wh weights edge (i,j)-(i+1,j),
    wv edge (i,j)-(i,j+1); boundary weights ignored.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = du.shape[-2], du.shape[-1]
    wh = wh.at[..., :, -1].set(0.0)
    wv = wv.at[..., -1, :].set(0.0)

    pad = [(0, 0)] * (du.ndim - 2)
    w_n = jnp.pad(wv[..., :-1, :], pad + [(1, 0), (0, 0)])
    w_w = jnp.pad(wh[..., :, :-1], pad + [(0, 0), (1, 0)])
    sum_w = w_n + w_w + wv + wh
    A11 = a11 + sum_w
    A22 = a22 + sum_w
    det = A11 * A22 - a12 * a12
    det = jnp.where(det == 0, 1.0, det)
    i11 = A22 / det
    i12 = -a12 / det
    i22 = A11 / det

    kernel = partial(_sor_kernel, iterations=iterations, omega=float(omega))
    flat = [x.reshape((-1, h, w))
            for x in (du, dv, i11, i12, i22, b1, b2, w_n, w_w, wv, wh)]
    batch = flat[0].shape[0]
    # one grid program per batch element, each owning one [1, H, W] block in
    # VMEM across the whole iteration loop
    spec = pl.BlockSpec((1, h, w), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out_du, out_dv = pl.pallas_call(
        kernel,
        grid=(batch,),
        out_shape=(jax.ShapeDtypeStruct((batch, h, w), du.dtype),
                   jax.ShapeDtypeStruct((batch, h, w), dv.dtype)),
        in_specs=[spec] * 11,
        out_specs=(spec, spec),
    )(*flat)
    return (out_du.reshape(du.shape), out_dv.reshape(dv.shape))


def available() -> bool:
    """True when running on a TPU backend where the Mosaic kernel compiles."""
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False
