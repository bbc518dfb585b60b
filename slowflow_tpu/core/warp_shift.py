"""Small-motion shift warp: Pallas TPU kernel + automatic dispatch.

The one-hot MXU warp (`core.warp._warp_banded`, `core.warp_pallas`) pays
~3 * wy_win * wx_win MACs per output pixel regardless of the actual motion:
its cost is set by the worst-case halo, not the flow. Slow Flow's adaptive
frame rate deliberately keeps jets at ~2 px/frame (adaptiveFR quantile
targeting, slow_flow.cpp:322-351), so the *integer displacement range* of a
32-row strip is tiny almost everywhere. This kernel exploits that: each
(frame, row strip) anchors a source window at the strip's minimum integer
displacement, and the bilinear warp becomes a static (Ky+1)x(Kx+1) grid of
in-VMEM shifted multiply-accumulates — a few hundred VPU flops per pixel,
no one-hot build, no MXU, no HBM intermediates.

Exactness: when every local corner index fits [0, K] (checked in the XLA
pre-pass over the valid image region), the kernel computes the exact f32
4-corner bilinear sample (weight products are rounded once, so values can
differ from the banded path by ~1e-7 relative). `warp_stack_auto` picks,
per call at runtime via lax.switch: the K=4 variant, the K=12 variant, or
the banded one-hot fallback — results are always valid; shift is the fast
case.

Reference semantics matched: `Variational_AUX_MT::image_warp`
(variational_aux_mt.cpp:722-756) — per-corner clamped sampling, mask = 1
iff the continuous coordinate is in-bounds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

R_STRIP = 32     # output rows per strip
PADT = 16        # top/bottom anchor headroom (rows)
PADL = 16        # left/right anchor headroom (cols)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_kernel(win_ref, lkx0_ref, lkx1_ref, dx_ref, lky0_ref, lky1_ref,
                  dy_ref, out_ref, *, c: int, r: int, wp: int,
                  kx: int, ky: int):
    from jax.experimental.pallas import tpu as pltpu

    win = win_ref[0]                      # [C, win_h, Wp]
    lkx0 = lkx0_ref[0]                    # [r, Wp] int32
    lkx1 = lkx1_ref[0]
    dx = dx_ref[0]                        # [r, Wp] f32
    lky0 = lky0_ref[0]
    lky1 = lky1_ref[0]
    dy = dy_ref[0]

    # Column-shifted copies of the window. The roll wraps the first k junk
    # columns to the far right; they can only land at output columns >= W
    # (sliced off by the caller) because k <= Kx and Wp >= W + Kx.
    rolled = [win if k == 0 else pltpu.roll(win, wp - k, axis=2)
              for k in range(kx + 1)]
    one = jnp.float32(1.0)
    wxs = [(lkx0 == k).astype(jnp.float32) * (one - dx)
           + (lkx1 == k).astype(jnp.float32) * dx
           for k in range(kx + 1)]

    acc = jnp.zeros((c, r, wp), jnp.float32)
    for k in range(ky + 1):
        wy = ((lky0 == k).astype(jnp.float32) * (one - dy)
              + (lky1 == k).astype(jnp.float32) * dy)
        t = wxs[0][None] * rolled[0][:, k:k + r, :]
        for q in range(1, kx + 1):
            t = t + wxs[q][None] * rolled[q][:, k:k + r, :]
        acc = acc + wy[None] * t
    out_ref[0] = acc


def _coords(wx, wy, factors, h, w):
    """Clamped bilinear corner indices + fractions for each frame factor."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=wx.dtype),
                          jnp.arange(w, dtype=wx.dtype), indexing="ij")
    x = xx + factors[:, None, None] * wx          # [F, H, W]
    y = yy + factors[:, None, None] * wy
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    dx = x - x0f
    dy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    inside = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1))
    return x0, x1, dx, y0, y1, dy, inside


def _shift_impl(src_pad, planes, starts, *, f: int, n_r: int, c: int,
                r: int, win_h: int, wp: int, kx: int, ky: int,
                interpret: bool):
    """Window pre-pass + pallas call. planes: 6 tensors [F, Hp, Wp];
    starts: [F*n_r, 2] (row, col) into src_pad. Returns [F, C, Hp, Wp]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = f * n_r

    def slice_win(args):
        st, fi = args
        return jax.lax.dynamic_slice(
            src_pad, (fi, 0, st[0], st[1]), (1, c, win_h, wp))[0]

    frame_of = (jnp.arange(nb, dtype=jnp.int32) // n_r)
    windows = jax.lax.map(slice_win, (starts, frame_of))   # [nb,C,win_h,Wp]

    def blk(a):
        return a.reshape(nb, r, wp)

    lkx0, lkx1, dxp, lky0, lky1, dyp = [blk(a) for a in planes]

    cspec = pl.BlockSpec((1, r, wp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_shift_kernel, c=c, r=r, wp=wp, kx=kx, ky=ky),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, c, win_h, wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec, cspec, cspec, cspec, cspec,
        ],
        out_specs=pl.BlockSpec((1, c, r, wp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, c, r, wp), jnp.float32),
        interpret=interpret,
    )(windows, lkx0, lkx1, dxp, lky0, lky1, dyp)
    return out.reshape(f, n_r, c, r, wp).transpose(0, 2, 1, 3, 4) \
              .reshape(f, c, n_r * r, wp)


def warp_stack_shift_parts(seq_nz, wx, wy, factors_nz, *, k_pairs=None,
                           kx_ks=(4, 12), r: int = R_STRIP,
                           interpret: bool = False):
    """Build the dispatch pieces for warping a stack of frames (no identity
    frame) by per-frame `factors_nz`. `wx`/`wy` may be [H, W] (shared flow,
    the per-frame case) or [F, H, W] (per-item flow — used to flatten a jet
    batch into the item axis); `_coords` broadcasts either shape.

    `k_pairs` is an ordered ladder of (kx, ky) variants, cheapest (fewest
    shift terms) first — anisotropic entries exploit that real video motion
    is usually x-dominated. Defaults to the cross product of `kx_ks` with a
    small-ky rung per kx, sorted by term count.

    Returns (sel, branch_fns) where sel is an int32 scalar selecting which
    variant is exact (len(k_pairs) = fallback needed), and branch_fns[i]
    computes the warped stack [F, C, H, W] for variant i.
    """
    if k_pairs is None:
        k_pairs = sorted(
            {(kx, ky) for kx in kx_ks for ky in (min(kx_ks), kx)},
            key=lambda p: (p[0] + 2) * (p[1] + 2))
    f, c, h, w = seq_nz.shape
    n_r = -(-h // r)
    hp = n_r * r
    k_max = max(max(p) for p in k_pairs)
    wp = _round_up(w + k_max, 128)
    win_h = _round_up(r + k_max + 1, 8)
    hpad_top = PADT
    hpad_bot = hpad_top + win_h + hp - h
    wpad_l = PADL
    wpad_r = wp - w + PADL

    x0, x1, dx, y0, y1, dy, _ = _coords(wx, wy, factors_nz, h, w)
    jj = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ii = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    dispx0 = x0 - jj
    dispx1 = x1 - jj
    dispy0 = y0 - ii
    dispy1 = y1 - ii

    # per-(frame, strip) anchors over the valid region
    def strip_red(a, fn):
        pad = jnp.pad(a, ((0, 0), (0, hp - h), (0, 0)), mode="edge")
        return fn(pad.reshape(f, n_r, r, w), (2, 3))

    off_x = strip_red(dispx0, jnp.min)            # [F, n_r]
    off_y = strip_red(dispy0, jnp.min)
    rng_x = strip_red(dispx1, jnp.max) - off_x    # local corner max
    rng_y = strip_red(dispy1, jnp.max) - off_y
    anchors_ok = ((jnp.abs(off_x) <= PADL).all()
                  & (jnp.abs(off_y) <= PADT).all())
    mrx = rng_x.max()
    mry = rng_y.max()
    # variant i usable iff both axis ranges fit and anchors have headroom;
    # scan the ladder from most expensive down so the cheapest fit wins
    sel = jnp.int32(len(k_pairs))                  # default: fallback
    for i in reversed(range(len(k_pairs))):
        kx_i, ky_i = k_pairs[i]
        sel = jnp.where(anchors_ok & (mrx <= kx_i) & (mry <= ky_i),
                        jnp.int32(i), sel)

    # local per-pixel corner indices relative to the strip anchor
    def localize(a, off):
        rep = jnp.repeat(off, r, axis=1)[:, :h, None]   # [F, H, 1]
        return a - rep

    lkx0 = localize(dispx0, off_x)
    lkx1 = localize(dispx1, off_x)
    lky0 = localize(dispy0, off_y)
    lky1 = localize(dispy1, off_y)

    def padhw(a, fill=0):
        return jnp.pad(a, ((0, 0), (0, hp - h), (0, wp - w)),
                       constant_values=fill)

    planes = (padhw(lkx0), padhw(lkx1), padhw(dx),
              padhw(lky0), padhw(lky1), padhw(dy))

    src_pad = jnp.pad(seq_nz, ((0, 0), (0, 0),
                               (hpad_top, hpad_bot), (wpad_l, wpad_r)),
                      mode="edge")
    srow = (PADT + jnp.arange(n_r, dtype=jnp.int32)[None, :] * r
            + off_y.astype(jnp.int32))             # [F, n_r]
    scol = (PADL + off_x.astype(jnp.int32))        # [F, n_r]
    starts = jnp.stack([srow, scol], -1).reshape(f * n_r, 2)

    def make_branch(kx, ky):
        def branch(_):
            out = _shift_impl(src_pad, planes, starts, f=f, n_r=n_r, c=c,
                              r=r, win_h=win_h, wp=wp, kx=kx, ky=ky,
                              interpret=interpret)
            return out[:, :, :h, :w]
        return branch

    return sel, [make_branch(kx, ky) for kx, ky in k_pairs]


def warp_stack_auto(seq, wx, wy, ref: int, *, kx_ks=(4, 12),
                    r: int = R_STRIP, interpret: bool = False):
    """Warp the frame window [2*ref+1, C, H, W] by per-frame factor
    (k - ref), choosing per call between shift variants and the banded
    one-hot fallback. The factor-0 frame is the identity and is passed
    through. Returns (warped [F, C, H, W], masks [F, H, W])."""
    from .warp import warp_bilinear

    seq = jnp.asarray(seq, jnp.float32)
    f_all, c, h, w = seq.shape
    nz = [k for k in range(f_all) if k != ref]

    # per-frame variant selection: the +-1 offsets see half the displacement
    # range of the +-2 ones, so they usually take the cheap small-K variant
    # even when the outer frames need K=12 or the banded fallback
    outs = {}
    for k in nz:
        fac = float(k - ref)
        sel, branches = warp_stack_shift_parts(
            seq[k][None], wx, wy, jnp.asarray([fac], jnp.float32),
            kx_ks=kx_ks, r=r, interpret=interpret)

        def banded(_, k=k, fac=fac):
            return warp_bilinear(seq[k], wx, wy, factor=fac,
                                 with_mask=False)[0][None]

        outs[k] = jax.lax.switch(sel, branches + [banded], None)[0]

    warped = jnp.stack([seq[k] if k == ref else outs[k]
                        for k in range(f_all)])

    factors_all = (jnp.arange(f_all, dtype=jnp.float32) - ref)
    *_, inside = _coords(wx, wy, factors_all, h, w)
    return warped, inside.astype(jnp.float32)


def warp_stack_auto_batched(seq, wx, wy, ref: int, *, kx_ks=(4, 12),
                            r: int = R_STRIP, interpret: bool = False):
    """Batched `warp_stack_auto`: seq [B, F, C, H, W], wx/wy [B, H, W].

    One Pallas dispatch per frame offset covers the whole jet batch — the
    batch flattens into the kernel's item axis, so the grid grows to
    B * n_strips instead of issuing B separate programs. The shift-variant
    switch is batch-global: `warp_stack_shift_parts` already reduces its
    range/anchor checks over all items, and the variant ladder is nested
    (each later (kx, ky) dominates the previous), so the shared choice is
    exact for every jet in the batch.

    Returns (warped [B, F, C, H, W], masks [B, F, H, W])."""
    from .warp import warp_bilinear

    seq = jnp.asarray(seq, jnp.float32)
    b, f_all, c, h, w = seq.shape
    nz = [k for k in range(f_all) if k != ref]

    outs = {}
    for k in nz:
        fac = float(k - ref)
        sel, branches = warp_stack_shift_parts(
            seq[:, k], wx, wy, jnp.full((b,), fac, jnp.float32),
            kx_ks=kx_ks, r=r, interpret=interpret)

        def banded(_, k=k, fac=fac):
            return jax.vmap(
                lambda im, u, v: warp_bilinear(im, u, v, factor=fac,
                                               with_mask=False)[0]
            )(seq[:, k], wx, wy)

        outs[k] = jax.lax.switch(sel, branches + [banded], None)  # [B,C,H,W]

    warped = jnp.stack([seq[:, k] if k == ref else outs[k]
                        for k in range(f_all)], axis=1)

    factors_all = (jnp.arange(f_all, dtype=jnp.float32) - ref)
    fb = factors_all[None, :, None, None]
    xq = jnp.arange(w, dtype=jnp.float32)[None, None, None, :] \
        + fb * wx[:, None]
    yq = jnp.arange(h, dtype=jnp.float32)[None, None, :, None] \
        + fb * wy[:, None]
    inside = ((xq >= 0) & (xq <= w - 1) & (yq >= 0) & (yq <= h - 1))
    return warped, inside.astype(jnp.float32)
