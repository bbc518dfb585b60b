"""Pallas TPU kernel: banded bilinear warp with VMEM-resident one-hots.

The XLA banded warp (core.warp._warp_banded) materializes the one-hot tensor
Ox and the intermediate C in HBM (~1.5 MB per 16x128 output block, ~100 MB
per warp). This kernel keeps both in VMEM: an XLA pre-pass slices the
per-block source windows (C x (R+2D) x (T+2D), ~90 KB each — manual HBM DMA
is unsupported by this backend's Mosaic pipeline, so windows pass through a
pre-tiled tensor), and the kernel then builds the bilinear one-hots and runs
the two contractions entirely on-chip — cutting the warp's HBM traffic ~6x.

Exactness condition matches the XLA banded path: displacement *variation*
within a block bounded by the 2*D halo; the window origin follows the block's
minimum sample coordinate, so arbitrarily large smooth motion is exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

R = 16     # output rows per block
T = 128    # output columns per block
D = 16     # displacement halo


def _kernel(offs_ref, win_ref, x0_ref, x1_ref, dx_ref, y0_ref, y1_ref,
            dy_ref, out_ref, *, c: int, wy_win: int, wx_win: int):
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    off_y = offs_ref[b, 0]
    off_x = offs_ref[b, 1]

    x0 = x0_ref[0]            # [R, T] int32 (clamped global corner columns)
    x1 = x1_ref[0]
    dx = dx_ref[0]
    y0 = y0_ref[0]
    y1 = y1_ref[0]
    dy = dy_ref[0]
    lx0 = jnp.clip(x0 - off_x, 0, wx_win - 1).reshape(1, R * T)
    lx1 = jnp.clip(x1 - off_x, 0, wx_win - 1).reshape(1, R * T)
    ly0 = jnp.clip(y0 - off_y, 0, wy_win - 1).reshape(1, R * T)
    ly1 = jnp.clip(y1 - off_y, 0, wy_win - 1).reshape(1, R * T)
    dxr = dx.reshape(1, R * T)
    dyr = dy.reshape(1, R * T)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx_win, R * T), 0)
    ox = ((iota_x == lx0) * (1.0 - dxr) + (iota_x == lx1) * dxr)

    win = win_ref[0].reshape(c * wy_win, wx_win)
    # Mosaic rejects Precision.HIGH but accepts HIGHEST, which guarantees the
    # exact f32 MXU path on every TPU generation (DEFAULT may lower to bf16
    # passes on some).
    c_mat = jax.lax.dot_general(
        win, ox, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).reshape(c, wy_win, R * T)

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (wy_win, R * T), 0)
    oy = ((iota_y == ly0) * (1.0 - dyr) + (iota_y == ly1) * dyr)

    out = (oy[None] * c_mat).sum(1)               # [C, R*T]
    out_ref[0] = out.reshape(c, R, T)


def _impl(src, wx, wy, factors, interpret: bool = False):
    """src: [F, C, H, W] frame stack; factors: [F]. The (frame, block) pair
    is flattened into the pallas grid so no axis is vmapped over the kernel
    (vmap of pallas_call stages the mapped axis into VMEM on this backend)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F, c, h, w = src.shape
    wy_win = min(R + 2 * D, h)
    wx_win = min(T + 2 * D, w)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=wx.dtype),
                          jnp.arange(w, dtype=wx.dtype), indexing="ij")
    x = xx + factors[:, None, None] * wx                    # [F, H, W]
    y = yy + factors[:, None, None] * wy
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    dx = x - x0f
    dy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    pad_r = (-h) % R
    pad_c = (-w) % T

    def pad2(a):
        return jnp.pad(a, ((0, 0), (0, pad_r), (0, pad_c)), mode="edge")

    hp, wp = h + pad_r, w + pad_c
    n_r, n_c = hp // R, wp // T
    nb = F * n_r * n_c

    def blocks(a):
        return (pad2(a).reshape(F, n_r, R, n_c, T).transpose(0, 1, 3, 2, 4)
                .reshape(nb, R, T))

    bx0 = blocks(x0)
    bx1 = blocks(x1)
    bdx = blocks(dx)
    by0 = blocks(y0)
    by1 = blocks(y1)
    bdy = blocks(dy)

    off_x = jnp.clip(bx0.min((1, 2)) - D, 0, max(w - wx_win, 0))
    off_y = jnp.clip(by0.min((1, 2)) - D, 0, max(h - wy_win, 0))
    offs = jnp.stack([off_y, off_x], 1).astype(jnp.int32)   # [nb, 2]
    frame_of_block = (jnp.arange(nb) // (n_r * n_c)).astype(jnp.int32)

    # XLA pre-pass: tile out the per-block source windows
    def slice_win(args):
        o, f = args
        return jax.lax.dynamic_slice(src, (f, 0, o[0], o[1]),
                                     (1, c, wy_win, wx_win))[0]

    windows = jax.lax.map(slice_win, (offs, frame_of_block))  # [nb, C, wy, wx]

    block = pl.BlockSpec((1, R, T), lambda b, o: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, c, wy_win, wx_win), lambda b, o: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            block, block, block, block, block, block,
        ],
        out_specs=pl.BlockSpec((1, c, R, T), lambda b, o: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_kernel, c=c, wy_win=wy_win, wx_win=wx_win),
        out_shape=jax.ShapeDtypeStruct((nb, c, R, T), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs, windows, bx0, bx1, bdx, by0, by1, bdy)

    out = (out.reshape(F, n_r, n_c, c, R, T).transpose(0, 3, 1, 4, 2, 5)
           .reshape(F, c, hp, wp)[:, :, :h, :w])
    return out


_impl_jit = jax.jit(_impl, static_argnames=("interpret",))


def warp_stack_pallas(seq, wx, wy, factors, interpret=False):
    """Warp a frame stack [F, C, H, W] by per-frame factors in one kernel
    launch. Returns (warped [F, C, H, W], masks [F, H, W])."""
    seq = jnp.asarray(seq, jnp.float32)
    factors = jnp.asarray(factors, jnp.float32)
    F, c, h, w = seq.shape
    out = _impl(seq, wx, wy, factors, interpret=interpret)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = xx + factors[:, None, None] * wx
    y = yy + factors[:, None, None] * wy
    masks = ((x >= 0) & (x <= w - 1) & (y >= 0)
             & (y <= h - 1)).astype(seq.dtype)
    return out, masks


def warp_bilinear_pallas(src, wx, wy, factor=1.0, with_mask=True,
                         interpret=False):
    """Drop-in banded warp backed by the Pallas kernel (same call contract as
    core.warp.warp_bilinear)."""
    h, w = src.shape[-2], src.shape[-1]
    lead = src.shape[:-2]
    src4 = src.reshape((1, -1, h, w))
    out = _impl_jit(src4, jnp.asarray(wx, jnp.float32),
                    jnp.asarray(wy, jnp.float32),
                    jnp.asarray([factor], jnp.float32),
                    interpret=interpret)[0]
    out = out.reshape(lead + (h, w))
    if not with_mask:
        return out, None
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = xx + factor * wx
    y = yy + factor * wy
    mask = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)).astype(src.dtype)
    return out, mask
