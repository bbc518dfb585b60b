"""Merged warp + IRLS-assembly Pallas kernel, resident-source edition.

Per outer iteration the solve previously ran TWO Pallas dispatches with a
full HBM round-trip between them: the small-motion shift warp
(core/warp_shift.py) wrote the warped frame stack [2*ref+1, 3, H, W] to
HBM, and the fused assembly kernel (variational/fused_data.py) re-read it
through its own halo-extended strip windows. Both also paid a large
host-staging tax: per-(frame, strip) anchor windows were materialized by a
sequential `lax.map` of dynamic slices before the kernel even launched —
measured at a third of the warp phase's wall time, every outer iteration,
for source pixels that never change during the solve.

This edition removes the window staging. Anchoring happens ONCE per
(jet, frame) instead of per (jet, frame, strip): the global integer
displacement minimum of each frame shifts its whole edge-padded plane by a
single vectorized dynamic_slice in XLA (a handful of MB, no sequential
map), and the anchor rides into the kernel as an SMEM scalar. The shifted
stack is then an input block that stays VMEM-resident across the strip
grid (its BlockSpec index only changes per jet); each strip program slices
its source windows in-kernel with `pl.ds` at STATIC offsets and 8-aligned
row starts (`program_id * R_STRIP` plus a static multiple of 8; the sub-8
residue is absorbed as a static shift of the y-ladder slices, which costs
nothing). The shift-grid warp (core/warp_shift.py's bilinear ladder,
corner indices computed in-kernel from the flow strip) then feeds assembly
(fused_data.assemble_from_windows) directly: one dispatch per data-term
evaluation, no warped plane in HBM, no per-strip window staging in XLA.

Variant ladder. One (Kx+1)x(Ky+1) shift grid per |frame offset| group.
A variant is exact iff each frame's GLOBAL displacement SPAN (max - min,
bias removed by the anchor) fits its grid — Slow Flow's adaptive frame
rate keeps jets at ~2 px/frame (adaptiveFR quantile targeting,
slow_flow.cpp:322-351), so the cheap rungs fit almost always. A runtime
lax.switch picks the cheapest exact entry, else falls back to the banded
one-hot warp + the separate assembly kernel (always valid, any motion).

Exactness. The composition equals image_warp
(variational_aux_mt.cpp:722-756) -> get_derivatives
(variational_mt.cpp:87-166) -> add_data_and_match(_ref)
(variational_aux_mt.cpp:166-634): in-image pixels get the identical
4-corner clamped bilinear sample (same f32 ops in the same order as the
standalone shift kernel), and the conv halos outside the image are rebuilt
by the same edge replication the two-kernel path gets from jnp.pad — the
_xrepl/_yrepl selects applied to the in-kernel warped plane.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fused_data import (EXT, R_STRIP, _round_up, _xrepl, _yrepl,
                         assemble_from_windows, fused_data_system_batched)

YT = 16          # static top margin of the shifted source (rows)
XL = 16          # static left margin of the shifted source (cols)
SLACK = 16       # max |global anchor|; beyond it take the banded fallback

# ladder of ((kx_in, ky_in), (kx_out, ky_out)): shift-grid sizes for the
# |factor| == 1 frame group and for the outer (|factor| >= 2) group,
# cheapest first (term count = prod(K+1)). Spans are global per frame (the
# anchor removes bias), so rungs run wider than the per-strip ladder did;
# the kernel cost is dominated by the (K+1)^2 term math, so the cheap
# rungs earn their compile time (adaptiveFR pins jets at ~2 px/frame).
DEFAULT_LADDER = (((2, 2), (4, 4)),
                  ((4, 4), (8, 4)),
                  ((6, 4), (10, 8)),
                  ((10, 8), (14, 14)))


def _warp_window(win, wxe, wye, offx, offy, fac, *, kx: int, ky: int,
                 wp: int, w_img: int, h_img: int, grow0, win_h_a: int):
    """Warp one frame onto the halo-EXT strip plane, in VMEM.

    win: [3, win_h_a + ky, wp] source window whose row 0 / col 0 sit at
    image coords (grow0 + offy, offx - EXT) — the caller pre-shifted the
    source by the (offy, offx) anchor, so the window slice itself is
    static; wxe/wye: [win_h_a, wp] edge-replicated flow strips;
    offx/offy: the anchors as SMEM scalars; fac: static frame factor.
    Returns [3, win_h_a, wp]; values at plane rows/cols outside the image
    are garbage (weights select nothing) — the caller replaces them with
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
    # local corner indices relative to the frame's global anchor; in [0, K]
    # on the image (guaranteed by the caller's span check), out of range on
    # the halo (whose output is replaced anyway)
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
    # warp validity at the strip's real rows (rows EXT..EXT+r): the exact
    # `inside` predicate of core/warp_shift._coords — x/y here equal its
    # xx + fac*wx at every in-image pixel (jj/ii clamps only move halo and
    # padding coords, whose outputs are replaced/discarded anyway)
    inside = ((x >= 0) & (x <= w_img - 1)
              & (y >= 0) & (y <= h_img - 1)).astype(jnp.float32)
    return acc, inside


def _merged_kernel(offx_ref, offy_ref, src_ref, wxp_ref, wyp_ref, mask_ref,
                   du_ref, dv_ref, cw_ref, *out_refs, p, mode: str, ks_nz,
                   facs_nz, r: int, wp: int, w_img: int, h_img: int,
                   n_r: int, win_h_a: int, zero_duv: bool = False,
                   self_mask: bool = False):
    """One strip program: slice source + flow windows out of the resident
    anchored blocks, warp every window frame in VMEM, assemble.

    self_mask: mask_ref holds the OCCLUSION plane strip [1, r, Wp] instead
    of the precomputed gated/raw mask [1, N, r, Wp]; the kernel derives the
    per-offset validity masks from the warp coordinates it already computes
    (succ_mask semantics: offset s uses the warp mask of non-ref frame
    nz[s], variational_mt.cpp:97-110) and, in assembly mode, applies the
    occlusion/direction gate of compute_one_level.gate_masks
    (variational_mt.cpp:292-320) in VMEM — the caller then never rebuilds
    coordinate or mask planes between outer iterations."""
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    jet = pid // n_r
    sloc = pid % n_r
    grow0 = sloc * r - EXT
    row_a = pl.multiple_of(sloc * r, 8)
    ref = p.ref

    # flow strips: padded flow rows = image rows + EXT, cols + EXT, so the
    # halo-EXT window of strip sloc starts at padded row sloc * r (aligned)
    wxe = wxp_ref[0, pl.ds(row_a, win_h_a), :]
    wye = wyp_ref[0, pl.ds(row_a, win_h_a), :]

    # shifted-source rows = image rows - anchor + YT, so every frame's
    # window starts at padded row sloc*r + (YT - EXT): 8-aligned by loading
    # from the rounded-down start and slicing the residue statically (free)
    e = YT - EXT
    c8 = (e // 8) * 8
    d = e - c8

    def window(fi: int, rows: int):
        n_rows = _round_up(d + rows, 8)
        win = src_ref[0, fi, :, pl.ds(pl.multiple_of(row_a + c8, 8), n_rows),
                      XL - EXT:XL - EXT + wp]
        return win[:, d:d + rows]

    wext = []
    insides = []
    i_nz = 0
    for k in range(2 * ref + 1):
        if k == ref:
            wext.append(window(k, win_h_a))
            continue
        kx, ky = ks_nz[i_nz]
        win = window(k, win_h_a + ky)
        acc, inside = _warp_window(
            win, wxe, wye, offx_ref[jet, i_nz],
            offy_ref[jet, i_nz], facs_nz[i_nz], kx=kx, ky=ky,
            wp=wp, w_img=w_img, h_img=h_img, grow0=grow0,
            win_h_a=win_h_a)
        wext.append(_xrepl(_yrepl(acc, grow0, h_img), w_img))
        if self_mask:
            # window layout puts image col j at plane col j+EXT; the mask
            # planes are unshifted — rotate the EXT offset away (the wrap
            # junk lands in the discarded padding columns)
            from jax.experimental.pallas import tpu as pltpu
            insides.append(pltpu.roll(inside[EXT:EXT + r],
                                      (wp - EXT) % wp, axis=1))
        i_nz += 1
    if self_mask:
        # per-offset masks: offset s < ref uses frame s's warp mask, else
        # frame s+1's — i.e. exactly the s-th warped (non-ref) frame's
        mask_full = insides
        if mode == "assembly":
            data_norm = float(sum(p.rho[s] + p.omega[s]
                                  for s in range(ref)))
            o = mask_ref[0]
            factor = (1.0 + (o == 0.0).astype(jnp.float32)) * data_norm
            backward = (o >= 0.0).astype(jnp.float32) / factor
            forward = (o <= 0.0).astype(jnp.float32) / factor
            mask_full = [
                m * (jnp.zeros_like(o) if (p.one_direction and s < ref)
                     else (backward if s < ref else forward))
                for s, m in enumerate(mask_full)]
        mask_full = jnp.stack(mask_full)
    else:
        mask_full = mask_ref[0]
    outs = assemble_from_windows(wext, mask_full, du_ref[0], dv_ref[0],
                                 cw_ref[0], p=p, mode=mode, r=r, wp=wp,
                                 w_img=w_img, h_img=h_img, grow0=grow0,
                                 zero_duv=zero_duv)
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
                            *, zero_duv: bool = False, occ=None,
                            mode: str = "assembly", r: int = R_STRIP,
                            interpret: bool = False, ladder=DEFAULT_LADDER):
    """Batched merged warp+assembly. seq [B, 2*ref+1, 3, H, W] (the window
    frames, NOT warped); wx/wy [B, H, W] linearization-point flow; mask
    [B, 2*ref, H, W] (gated for assembly, raw for occ); du/dv [B, H, W];
    cw [B, 3, H, W].

    Self-masking: pass mask=None and occ=[B, H, W] (the occlusion plane) —
    the kernel then derives the validity masks from its own warp
    coordinates and applies the occlusion gate in VMEM, so the caller never
    materializes coordinate/mask planes (in occ mode the gate is skipped;
    the raw self-computed masks match succ_mask exactly).

    mode="assembly" -> (a11, a12, a22, b1, b2) each [B, H, W];
    mode="occ" -> (e0, e1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    self_mask = mask is None
    if self_mask:
        assert occ is not None, "self-masking needs the occ plane"
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
    ky_all = max(kk[g][1] for kk in ladder for g in range(2))
    # the in-kernel roll wraps kx junk columns to the far right; keep them
    # beyond the last plane column the convs read (w + EXT + 1)
    wp = _round_up(w + 2 * EXT + kx_all + 2, 128)
    nb = b * n_r

    # ---- per-(jet, frame) global anchors and spans: exactly the CLIPPED
    # corner indices the kernel recomputes, with the same f32 op sequence
    # (floor(jj + fac*flow): the addition's rounding can cross an integer
    # boundary that floor(fac*flow) alone would not predict; border clamps
    # can pull a corner BELOW a positive anchor or above a negative one,
    # so the clip must be part of the range) ----
    fac_arr = jnp.asarray(facs, jnp.float32)[None, :, None, None]
    jj = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    ii = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    x0i = jnp.floor(jj + fac_arr * wx[:, None])            # [B, F, H, W]
    y0i = jnp.floor(ii + fac_arr * wy[:, None])
    dispx0 = jnp.clip(x0i, 0, w - 1) - jj
    dispx1 = jnp.clip(x0i + 1, 0, w - 1) - jj
    dispy0 = jnp.clip(y0i, 0, h - 1) - ii
    dispy1 = jnp.clip(y0i + 1, 0, h - 1) - ii
    off_x = dispx0.min((2, 3)).astype(jnp.int32)           # [B, F]
    off_y = dispy0.min((2, 3)).astype(jnp.int32)
    span_x = (dispx1.max((2, 3)).astype(jnp.int32) - off_x).max(0)  # [F]
    span_y = (dispy1.max((2, 3)).astype(jnp.int32) - off_y).max(0)
    anchors_ok = ((jnp.abs(off_x) <= SLACK).all()
                  & (jnp.abs(off_y) <= SLACK).all())

    fits = []
    for kin, kout in ladder:
        fit = anchors_ok
        for i, g in enumerate(groups):
            kx_i, ky_i = (kin, kout)[g]
            fit = fit & (span_x[i] <= kx_i) & (span_y[i] <= ky_i)
        fits.append(fit)
    sel = jnp.int32(len(ladder))
    for i in reversed(range(len(ladder))):
        sel = jnp.where(fits[i], jnp.int32(i), sel)

    # ---- anchored resident source: pad once (loop-invariant, hoisted out
    # of the solve's while_loop), then shift each (jet, frame) plane by its
    # anchor with ONE vectorized dynamic_slice ----
    hps = _round_up(YT + hp + win_h_a + ky_all + 8, 8)
    wpf = _round_up(XL + wp, 128)
    pt, plc = SLACK + YT, SLACK + XL
    src_big = jnp.pad(seq, ((0, 0), (0, 0), (0, 0),
                            (pt, hps + SLACK - h - YT),
                            (plc, wpf + SLACK - w - XL)), mode="edge")
    zero = jnp.zeros((b, 1), jnp.int32)
    offs_all = jnp.stack([  # ref frame shifts by 0
        jnp.concatenate([off_y[:, :ref], zero, off_y[:, ref:]], 1),
        jnp.concatenate([off_x[:, :ref], zero, off_x[:, ref:]], 1)], -1)

    def shift_one(frame, off):
        return jax.lax.dynamic_slice(
            frame, (0, pt + off[0] - YT, plc + off[1] - XL), (c, hps, wpf))

    src = jax.vmap(jax.vmap(shift_one))(src_big, offs_all)

    hpf = _round_up(EXT + hp + win_h_a, 8)
    flow_pads = ((0, 0), (EXT, hpf - h - EXT), (EXT, wp - w - EXT))
    wxp = jnp.pad(wx, flow_pads, mode="edge")
    wyp = jnp.pad(wy, flow_pads, mode="edge")

    def padp(a):
        pads = [(0, 0)] * (a.ndim - 2) + [(0, hp - h), (0, wp - w)]
        return jnp.pad(a, pads)

    if self_mask:
        mask_p = padp(occ).reshape(nb, r, wp)
    else:
        mask_p = padp(mask).reshape(b, n, n_r, r, wp) \
            .transpose(0, 2, 1, 3, 4).reshape(nb, n, r, wp)
    du_p = padp(du).reshape(nb, r, wp)
    dv_p = padp(dv).reshape(nb, r, wp)
    cw_p = padp(cw).reshape(b, c, n_r, r, wp) \
        .transpose(0, 2, 1, 3, 4).reshape(nb, c, r, wp)

    n_out = {"assembly": 5, "occ": 2, "occ_assembly": 12}[mode]
    pspec = pl.BlockSpec((1, r, wp), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM)
    jspec = pl.BlockSpec((1, hpf, wp), lambda s, n_r=n_r: (s // n_r, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((b, fnz), lambda s: (0, 0),
                         memory_space=pltpu.SMEM)
    mspec = pspec if self_mask else pl.BlockSpec(
        (1, n, r, wp), lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM)

    def make_branch(kin, kout):
        ks_nz = [kin if g == 0 else kout for g in groups]

        def branch(_):
            outs = pl.pallas_call(
                partial(_merged_kernel, p=p, mode=mode, zero_duv=zero_duv,
                        self_mask=self_mask, ks_nz=ks_nz,
                        facs_nz=facs, r=r, wp=wp, w_img=w, h_img=h,
                        n_r=n_r, win_h_a=win_h_a),
                grid=(nb,),
                in_specs=[
                    sspec, sspec,
                    pl.BlockSpec((1, f, c, hps, wpf),
                                 lambda s, n_r=n_r: (s // n_r, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    jspec, jspec,
                    mspec,
                    pspec, pspec,
                    pl.BlockSpec((1, c, r, wp), lambda s: (s, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(pspec,) * n_out,
                out_shape=(jax.ShapeDtypeStruct((nb, r, wp),
                                                jnp.float32),) * n_out,
                # the wide rungs keep kx+1 rolled window copies live; the
                # default 16 MB scoped-vmem stack is far below the chip's
                # 128 MB VMEM
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(off_x, off_y, src, wxp, wyp, mask_p, du_p, dv_p, cw_p)
            return tuple(o.reshape(b, hp, wp)[:, :h, :w] for o in outs)

        return branch

    def fallback(_):
        warped = _banded_stack(seq, wx, wy, ref)
        if self_mask:
            # rebuild in XLA exactly what the kernel self-derives: per-offset
            # succ masks from the warp coordinates, occlusion-gated for
            # assembly (compute_one_level.gate_masks semantics)
            from ..core.warp_shift import _coords

            factors_all = jnp.arange(f, dtype=jnp.float32) - ref
            inside = jax.vmap(
                lambda u, v: _coords(u, v, factors_all, h, w)[-1])(wx, wy)
            inside = inside.astype(jnp.float32)                # [B, F, H, W]
            past = (jnp.arange(n) < ref)[:, None, None]
            m = jnp.where(past, inside[:, :n], inside[:, 1:])  # succ_mask
            if mode == "assembly":
                data_norm = float(sum(p.rho[s] + p.omega[s]
                                      for s in range(ref)))
                factor = (1.0 + (occ == 0.0)) * data_norm
                backward = (occ >= 0.0) / factor
                forward = (occ <= 0.0) / factor
                s_ix = jnp.arange(n)[:, None, None]
                gate = jnp.where(s_ix < ref, backward[:, None],
                                 forward[:, None])
                if p.one_direction:
                    gate = jnp.where(s_ix < ref, 0.0, gate)
                m = m * gate
            eff_mask = m
        else:
            eff_mask = mask
        return fused_data_system_batched(warped, eff_mask, du, dv, cw, p,
                                         mode=mode, interpret=interpret,
                                         zero_duv=zero_duv)

    branches = [make_branch(kin, kout) for kin, kout in ladder]
    return jax.lax.switch(sel, branches + [fallback], None)


def fused_warp_data(seq, wx, wy, mask, du, dv, cw, p,
                    mode: str = "assembly", r: int = R_STRIP,
                    interpret: bool = False, ladder=DEFAULT_LADDER,
                    zero_duv: bool = False, occ=None):
    """Single-jet merged warp+assembly (see fused_warp_data_batched)."""
    outs = fused_warp_data_batched(
        seq[None], wx[None], wy[None],
        None if mask is None else mask[None], du[None], dv[None],
        cw[None], p, mode=mode, r=r, interpret=interpret, ladder=ladder,
        zero_duv=zero_duv, occ=None if occ is None else occ[None])
    return tuple(o[0] for o in outs)
