"""Merged warp + IRLS-assembly Pallas kernel (one dispatch per strip grid).

Per outer iteration the solve previously ran TWO Pallas dispatches with a
full HBM round-trip between them: the small-motion shift warp
(core/warp_shift.py) wrote the warped frame stack [2*ref+1, 3, H, W] to
HBM, and the fused assembly kernel (variational/fused_data.py) re-read it
through its own halo-extended strip windows (a second ~1.3x-inflated
copy). On the profiled chip both kernels sit far under the VPU and HBM
ceilings (docs/PROFILING.md roofline: 15% / 7%) — the cost is dispatch +
staging latency, so fusing them attacks exactly the bound that matters.

This module fuses the two: each strip program warps its own halo-EXT
window of every window frame in VMEM — the bilinear shift grid of
core/warp_shift.py with the corner indices computed in-kernel from the
flow strip (2 input planes instead of 6 precomputed index planes per
frame) — and feeds the assembly math (fused_data.assemble_from_windows)
directly. No warped plane ever reaches HBM and one dispatch replaces two.

Exactness. The composition equals image_warp
(variational_aux_mt.cpp:722-756) -> get_derivatives
(variational_mt.cpp:87-166) -> add_data_and_match(_ref)
(variational_aux_mt.cpp:166-634): in-image pixels get the identical
4-corner clamped bilinear sample (same f32 ops in the same order as the
standalone shift kernel), and the conv halos outside the image are rebuilt
by the same edge replication the two-kernel path gets from jnp.pad — the
_xrepl/_yrepl selects applied to the in-kernel warped plane.

Variant ladder. One static (Kx+1)x(Ky+1) shift grid per |frame offset|
group: inner (+-1) frames see half the displacement of outer (+-2+) ones,
so ladder entries pair a cheap inner grid with a wider outer one. A
runtime lax.switch picks the cheapest entry whose measured per-strip
displacement ranges fit, else falls back to the banded one-hot warp + the
separate assembly kernel (always valid, any motion).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fused_data import (EXT, R_STRIP, _round_up, _xrepl, _yrepl,
                         assemble_from_windows, fused_data_system_batched)

PADT = 20        # source-window anchor headroom (rows)
PADL = 20        # (cols); anchors beyond +-(PAD-EXT) take the fallback

# ladder of ((kx_in, ky_in), (kx_out, ky_out)): shift-grid sizes for the
# |factor| == 1 frame group and for the outer (|factor| >= 2) group,
# cheapest first (term count = prod(K+1))
DEFAULT_LADDER = (((4, 4), (8, 4)),
                  ((4, 4), (12, 6)),
                  ((8, 6), (12, 12)))


def _warp_window(win, wxe, wye, offx, offy, fac, *, kx: int, ky: int,
                 wp: int, w_img: int, h_img: int, grow0, win_h_a: int):
    """Warp one frame onto the halo-EXT strip plane, in VMEM.

    win: [3, win_h_src, Wp] anchored source window (edge-padded source);
    wxe/wye: [win_h_a, Wp] edge-replicated flow strips; offx/offy: scalar
    int32 window anchors; fac: static frame factor. Returns
    [3, win_h_a, Wp]; values at plane rows/cols outside the image are
    garbage (weights select nothing) — the caller replaces them with
    _xrepl/_yrepl edge replication."""
    from jax.experimental.pallas import tpu as pltpu

    rows_raw = jax.lax.broadcasted_iota(jnp.int32, (win_h_a, wp), 0) + grow0
    cols_raw = jax.lax.broadcasted_iota(jnp.int32, (win_h_a, wp), 1) - EXT
    jj = jnp.clip(cols_raw, 0, w_img - 1).astype(jnp.float32)
    ii = jnp.clip(rows_raw, 0, h_img - 1).astype(jnp.float32)
    x = jj + fac * wxe
    y = ii + fac * wye
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    dx = x - x0f
    dy = y - y0f
    x0i = x0f.astype(jnp.int32)
    y0i = y0f.astype(jnp.int32)
    x0 = jnp.clip(x0i, 0, w_img - 1)
    x1 = jnp.clip(x0i + 1, 0, w_img - 1)
    y0 = jnp.clip(y0i, 0, h_img - 1)
    y1 = jnp.clip(y0i + 1, 0, h_img - 1)
    # local corner indices relative to the window anchor; in [0, K] on the
    # image (guaranteed by the caller's range check), out of range on the
    # halo (whose output is replaced anyway)
    lkx0 = x0 - cols_raw - offx
    lkx1 = x1 - cols_raw - offx
    lky0 = y0 - rows_raw - offy
    lky1 = y1 - rows_raw - offy

    one = jnp.float32(1.0)
    rolled = [win if k == 0 else pltpu.roll(win, wp - k, axis=2)
              for k in range(kx + 1)]
    wxs = [(lkx0 == k).astype(jnp.float32) * (one - dx)
           + (lkx1 == k).astype(jnp.float32) * dx
           for k in range(kx + 1)]
    acc = jnp.zeros((3, win_h_a, wp), jnp.float32)
    for kq in range(ky + 1):
        wyw = ((lky0 == kq).astype(jnp.float32) * (one - dy)
               + (lky1 == kq).astype(jnp.float32) * dy)
        t = wxs[0][None] * rolled[0][:, kq:kq + win_h_a, :]
        for q in range(1, kx + 1):
            t = t + wxs[q][None] * rolled[q][:, kq:kq + win_h_a, :]
        acc = acc + wyw[None] * t
    return acc


def _merged_kernel(win_ref, refs_ref, wxe_ref, wye_ref, offx_ref, offy_ref,
                   mask_ref, du_ref, dv_ref, cw_ref, *out_refs,
                   p, mode: str, ks_nz, facs_nz, r: int, wp: int,
                   w_img: int, h_img: int, n_r: int, win_h_a: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    grow0 = (pid % n_r) * r - EXT
    wxe = wxe_ref[0]
    wye = wye_ref[0]
    ref = p.ref
    wext = []
    i_nz = 0
    for k in range(2 * ref + 1):
        if k == ref:
            wext.append(refs_ref[0])
            continue
        kx, ky = ks_nz[i_nz]
        # the anchor arrays ride whole in SMEM (Mosaic rejects sub-row
        # blocks of small scalar arrays); index by program id instead
        acc = _warp_window(win_ref[0, i_nz], wxe, wye,
                           offx_ref[pid, i_nz], offy_ref[pid, i_nz],
                           facs_nz[i_nz], kx=kx, ky=ky, wp=wp,
                           w_img=w_img, h_img=h_img, grow0=grow0,
                           win_h_a=win_h_a)
        wext.append(_xrepl(_yrepl(acc, grow0, h_img), w_img))
        i_nz += 1
    outs = assemble_from_windows(wext, mask_ref[0], du_ref[0], dv_ref[0],
                                 cw_ref[0], p=p, mode=mode, r=r, wp=wp,
                                 w_img=w_img, h_img=h_img, grow0=grow0)
    for ref_out, val in zip(out_refs, outs):
        ref_out[0] = val


def _banded_stack(seq, wx, wy, ref: int):
    """Fallback warped stack via the XLA banded one-hot warp (any motion)."""
    from ..core.warp import warp_bilinear

    outs = []
    for k in range(seq.shape[1]):
        if k == ref:
            outs.append(seq[:, k])
            continue

        def one(im, u, v, fac=float(k - ref)):
            return warp_bilinear(im, u, v, factor=fac, with_mask=False)[0]

        outs.append(jax.vmap(one)(seq[:, k], wx, wy))
    return jnp.stack(outs, 1)


def fused_warp_data_batched(seq, wx, wy, mask, du, dv, cw, p,
                            mode: str = "assembly", r: int = R_STRIP,
                            interpret: bool = False, ladder=DEFAULT_LADDER):
    """Batched merged warp+assembly. seq [B, 2*ref+1, 3, H, W] (the window
    frames, NOT warped); wx/wy [B, H, W] linearization-point flow; mask
    [B, 2*ref, H, W] (gated for assembly, raw for occ); du/dv [B, H, W];
    cw [B, 3, H, W].

    mode="assembly" -> (a11, a12, a22, b1, b2) each [B, H, W];
    mode="occ" -> (e0, e1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, c, h, w = seq.shape
    ref = p.ref
    n = 2 * ref
    nz = [k for k in range(f) if k != ref]
    facs = [float(k - ref) for k in nz]
    groups = [0 if abs(k - ref) <= 1 else 1 for k in nz]
    fnz = len(nz)

    r = min(r, _round_up(h, 8))
    n_r = -(-h // r)
    hp = n_r * r
    win_h_a = r + 2 * EXT
    kx_all = max(kk[g][0] for kk in ladder for g in range(2))
    # the in-kernel roll wraps kx junk columns to the far right; keep them
    # beyond the last plane column the convs read (w + EXT + 1)
    wp = _round_up(w + 2 * EXT + kx_all + 2, 128)
    nb = b * n_r

    # ---- per-(jet, frame, strip) anchors and ranges (exactly the corner
    # indices the kernel recomputes) ----
    fac_arr = jnp.asarray(facs, jnp.float32)[None, :, None, None]
    xq = (jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
          + fac_arr * wx[:, None])
    yq = (jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
          + fac_arr * wy[:, None])
    x0i = jnp.floor(xq).astype(jnp.int32)
    y0i = jnp.floor(yq).astype(jnp.int32)
    jj = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    ii = jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    dispx0 = jnp.clip(x0i, 0, w - 1) - jj
    dispx1 = jnp.clip(x0i + 1, 0, w - 1) - jj
    dispy0 = jnp.clip(y0i, 0, h - 1) - ii
    dispy1 = jnp.clip(y0i + 1, 0, h - 1) - ii

    def strip_red(rowred, fn):
        """rowred: [B, F, H] per-row reduction; reduce over each strip's
        halo-EXT row window (edge pad replicates the kernel's clamping)."""
        ap = jnp.pad(rowred, ((0, 0), (0, 0), (EXT, hp - h + EXT)),
                     mode="edge")
        wins = jnp.stack([ap[:, :, s * r:s * r + win_h_a]
                          for s in range(n_r)], 2)     # [B, F, n_r, win]
        return fn(wins, axis=3)                        # [B, F, n_r]

    off_x = strip_red(dispx0.min(3), jnp.min)
    off_y = strip_red(dispy0.min(3), jnp.min)
    rng_x = strip_red(dispx1.max(3), jnp.max) - off_x
    rng_y = strip_red(dispy1.max(3), jnp.max) - off_y
    anchors_ok = ((jnp.abs(off_x) <= PADL - EXT).all()
                  & (jnp.abs(off_y) <= PADT - EXT).all())

    fits = []
    for kin, kout in ladder:
        fit = anchors_ok
        for i, g in enumerate(groups):
            kx_i, ky_i = (kin, kout)[g]
            fit = fit & (rng_x[:, i].max() <= kx_i) \
                      & (rng_y[:, i].max() <= ky_i)
        fits.append(fit)
    sel = jnp.int32(len(ladder))
    for i in reversed(range(len(ladder))):
        sel = jnp.where(fits[i], jnp.int32(i), sel)

    # ---- variant-independent strip tensors ----
    def pad_planes(a):
        """[B, ..., H, W] -> halo-EXT strip windows [nb, ..., win_h_a, wp]."""
        pads = [(0, 0)] * (a.ndim - 2) + [(EXT, hp - h + EXT),
                                          (EXT, wp - w - EXT)]
        ap = jnp.pad(a, pads, mode="edge")
        wins = jnp.stack([ap[..., s * r:s * r + win_h_a, :]
                          for s in range(n_r)], 1)
        return wins.reshape((nb,) + wins.shape[2:])

    wxe = pad_planes(wx)
    wye = pad_planes(wy)
    refs = pad_planes(seq[:, ref])                     # [nb, 3, win, wp]

    def padp(a):
        pads = [(0, 0)] * (a.ndim - 2) + [(0, hp - h), (0, wp - w)]
        return jnp.pad(a, pads)

    mask_p = padp(mask).reshape(b, n, n_r, r, wp) \
        .transpose(0, 2, 1, 3, 4).reshape(nb, n, r, wp)
    du_p = padp(du).reshape(nb, r, wp)
    dv_p = padp(dv).reshape(nb, r, wp)
    cw_p = padp(cw).reshape(b, c, n_r, r, wp) \
        .transpose(0, 2, 1, 3, 4).reshape(nb, c, r, wp)

    offx_arr = off_x.transpose(0, 2, 1).reshape(nb, fnz)
    offy_arr = off_y.transpose(0, 2, 1).reshape(nb, fnz)

    n_out = 5 if mode == "assembly" else 2
    seq_nz = jnp.stack([seq[:, k] for k in nz], 1)   # static slices
    pspec = pl.BlockSpec((1, r, wp), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((nb, fnz), lambda s: (0, 0),
                         memory_space=pltpu.SMEM)

    def make_branch(kin, kout):
        ks_nz = [kin if g == 0 else kout for g in groups]
        ky_max = max(k[1] for k in ks_nz)
        win_h_src = _round_up(win_h_a + ky_max, 8)

        def branch(_):
            hpad_bot = PADT + (hp - h) + win_h_src
            src = jnp.pad(seq_nz, ((0, 0), (0, 0), (0, 0),
                                   (PADT, hpad_bot),
                                   (PADL, wp - w + PADL)), mode="edge")
            srow = (PADT - EXT
                    + (jnp.arange(n_r, dtype=jnp.int32) * r)[None, :, None]
                    + off_y.transpose(0, 2, 1))        # [B, n_r, F]
            scol = PADL - EXT + off_x.transpose(0, 2, 1)
            starts = jnp.stack([srow, scol], -1).reshape(nb * fnz, 2)
            items = jnp.arange(nb * fnz, dtype=jnp.int32)
            bidx = items // (n_r * fnz)
            fidx = items % fnz

            def slice_win(args):
                st, bi, fi = args
                return jax.lax.dynamic_slice(
                    src, (bi, fi, 0, st[0], st[1]),
                    (1, 1, 3, win_h_src, wp))[0, 0]

            wins = jax.lax.map(slice_win, (starts, bidx, fidx))
            wins = wins.reshape(nb, fnz, 3, win_h_src, wp)

            outs = pl.pallas_call(
                partial(_merged_kernel, p=p, mode=mode, ks_nz=ks_nz,
                        facs_nz=facs, r=r, wp=wp, w_img=w, h_img=h,
                        n_r=n_r, win_h_a=win_h_a),
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, fnz, 3, win_h_src, wp),
                                 lambda s: (s, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3, win_h_a, wp),
                                 lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, win_h_a, wp), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, win_h_a, wp), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    sspec, sspec,
                    pl.BlockSpec((1, n, r, wp), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pspec, pspec,
                    pl.BlockSpec((1, c, r, wp), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(pspec,) * n_out,
                out_shape=(jax.ShapeDtypeStruct((nb, r, wp),
                                                jnp.float32),) * n_out,
                interpret=interpret,
            )(wins, refs, wxe, wye, offx_arr, offy_arr,
              mask_p, du_p, dv_p, cw_p)
            return tuple(o.reshape(b, hp, wp)[:, :h, :w] for o in outs)

        return branch

    def fallback(_):
        warped = _banded_stack(seq, wx, wy, ref)
        return fused_data_system_batched(warped, mask, du, dv, cw, p,
                                         mode=mode, interpret=interpret)

    branches = [make_branch(kin, kout) for kin, kout in ladder]
    return jax.lax.switch(sel, branches + [fallback], None)


def fused_warp_data(seq, wx, wy, mask, du, dv, cw, p,
                    mode: str = "assembly", r: int = R_STRIP,
                    interpret: bool = False, ladder=DEFAULT_LADDER):
    """Single-jet merged warp+assembly (see fused_warp_data_batched)."""
    outs = fused_warp_data_batched(
        seq[None], wx[None], wy[None], mask[None], du[None], dv[None],
        cw[None], p, mode=mode, r=r, interpret=interpret, ladder=ladder)
    return tuple(o[0] for o in outs)
