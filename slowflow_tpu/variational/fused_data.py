"""Fused Pallas kernel: derivative stacks + IRLS data-term assembly.

The XLA path materializes 17 derivative planes of shape [2*ref, 3, H, W]
(~105 MB at 480x270, S=3) every outer iteration, then streams them back in
for the data-term assembly (variational_mt.cpp:87-166 +
variational_aux_mt.cpp:166-634) and the occlusion data costs
(variational_aux_mt.cpp:784-858). This kernel consumes the *warped frame
stack* (the only true input, [2*ref+1, 3, H, W] ~ 7 MB) and produces the
assembled normal-equation planes (a11, a12, a22, b1, b2) — or the occlusion
data costs (e0, e1) — directly: the convolutions happen on VMEM-resident
row strips via lane/sublane rolls, and no derivative plane ever touches HBM.

Exactness: strips carry a 4-pixel halo of edge-replicated rows/columns, so
the in-kernel 5-tap correlations (including the compound second-order ones)
reproduce `core.conv`'s clamp-to-edge semantics bit-for-bit in the interior
and at image borders. Per-frame weights rho_s / omega_s / time factors are
compile-time constants folded into the kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DATANORM = 0.1 * 0.1          # variational_aux_mt.h:25
DT_SCALE_GRAPHC = 0.01        # variational_aux_mt.h:26
EXT = 4                       # halo: 2 (conv) + 2 (second-order conv)
R_STRIP = 32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _c5x(a):
    """5-point derivative along lanes; valid where taps stay in the strip."""
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-1]
    c1 = 8.0 / 12.0
    c2 = 1.0 / 12.0

    def sh(o):
        return pltpu.roll(a, (-o) % n, axis=a.ndim - 1)

    return c2 * sh(-2) - c1 * sh(-1) + c1 * sh(1) - c2 * sh(2)


def _c5y(a):
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-2]
    c1 = 8.0 / 12.0
    c2 = 1.0 / 12.0

    def sh(o):
        return pltpu.roll(a, (-o) % n, axis=a.ndim - 2)

    return c2 * sh(-2) - c1 * sh(-1) + c1 * sh(1) - c2 * sh(2)


def _succ_ref_weights(p):
    """Static per-offset weights (variational_mt.cpp:343-361) and signed
    to-reference factors (variational_aux_mt.cpp:416-425)."""
    ref = p.ref
    rho = [p.rho[ref - 1 - s] if s < ref else p.rho[s - ref]
           for s in range(2 * ref)]
    om = [p.omega[ref - 1 - s] if s < ref else p.omega[s - ref]
          for s in range(2 * ref)]
    if p.one_direction:
        rho = [0.0] * ref + rho[ref:]
        om = [0.0] * ref + om[ref:]
    fac = [float(s - ref) if s < ref else -float(s - ref + 1)
           for s in range(2 * ref)]
    return rho, om, fac


def _xrepl(a, w: int):
    """Replace the halo columns of a derivative plane with the image-edge
    value, reproducing the clamp the XLA path applies to the *plane* (not
    the underlying image) before a second same-direction convolution."""
    cc = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 1) - EXT
    left = a[..., :, EXT:EXT + 1]
    right = a[..., :, EXT + w - 1:EXT + w]
    out = jnp.where(cc < 0, left, a)
    return jnp.where(cc > w - 1, right, out)


def _yrepl(a, grow0, h: int):
    """Row analogue of _xrepl. grow0 = global image row of ext row 0
    (traced; strips interior to the image are untouched)."""
    win_h = a.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 0)
    rr = rows + grow0
    top = a[..., EXT:EXT + 1, :]           # image row 0 iff grow0 == -EXT
    idx = jnp.clip(h - 1 - grow0, 0, win_h - 1)
    # one-hot row select (dynamic_slice on values is unsupported in Mosaic)
    bot = (a * (rows == idx).astype(a.dtype)).sum(axis=a.ndim - 2,
                                                  keepdims=True)
    out = jnp.where(rr < 0, top, a)
    return jnp.where(rr > h - 1, bot, out)


def assemble_from_windows(wext, mask_full, du, dv, cw, *,
                          p, mode: str, r: int, wp: int, w_img: int,
                          h_img: int, grow0, zero_duv: bool = False):
    """Data-term assembly on VMEM-resident halo-EXT strip windows.

    wext: [F, 3, win_h, Wp] warped-frame windows in assembly layout (image
    col j at plane col j+EXT, strip row i at plane row i+EXT, halos
    edge-replicated); mask_full: [N, r, Wp] (gated for assembly, raw for
    occ); du/dv: [r, Wp]; cw: [3, r, Wp]; grow0: global image row of ext
    row 0 (traced scalar). Returns the list of output planes [r, Wp] —
    (a11, a12, a22, b1, b2) or (e0, e1). Shared by the plain fused-data
    kernel and the merged warp+assembly kernel (fused_warp.py).

    zero_duv: STATIC promise that du == dv == 0 (true on every call when
    niter_inner == 1, the production config: the inner while evaluates the
    data terms exactly once, at the zero increment) — elides the
    linearization FMAs, which XLA cannot do for runtime zeros.

    mode="occ_assembly": ONE pass produces the occlusion data costs AND the
    normal-equation planes split into past/future partial sums — 12 planes
    (e0, e1, a11_b..b2_b, a11_f..b2_f). The occlusion/direction gate of
    compute_one_level.gate_masks (variational_mt.cpp:292-320) multiplies the
    per-offset data weight LINEARLY and takes one value per (pixel,
    past|future) group, so the caller can apply it after the discrete
    occlusion update:  a11 = backward*a11_b + forward*a11_f.  This is what
    lets ONE warp+derivative evaluation serve both the occlusion MRF costs
    (variational_aux_mt.cpp:784-858) and the first outer iteration's IRLS
    assembly — the two previously separate dispatches re-warped the same
    frames at the same linearization point. Requires zero_duv (the combined
    evaluation sits at the alternation top, before any increment) and no
    one_direction (that path never runs occlusion reasoning)."""
    ref = p.ref
    n = 2 * ref
    color_pen, grad_pen, _ = p.penalties()
    rho_w, omega_w, fac_w = _succ_ref_weights(p)
    hd = p.delta / 3.0
    hg = p.gamma / 3.0
    if mode == "occ_assembly":
        assert zero_duv and not p.one_direction, (zero_duv, p.one_direction)

    from jax.experimental.pallas import tpu as pltpu

    ref_img = wext[ref]

    def crop(a):
        """Realign the halo-extended plane to output coordinates: drop the
        EXT top rows and rotate the EXT left columns away (the wrapped junk
        lands at columns >= W, which the caller slices off)."""
        shifted = pltpu.roll(a, (wp - EXT) % wp, axis=a.ndim - 1)
        return shifted[..., EXT:EXT + r, :]

    if mode == "assembly":
        acc = [jnp.zeros((r, wp), jnp.float32) for _ in range(5)]
    elif mode == "occ_assembly":
        # past/future system accumulators + occlusion-cost accumulators
        acc_groups = [[jnp.zeros((r, wp), jnp.float32) for _ in range(5)]
                      for _ in range(2)]
        e0 = jnp.zeros((r, wp), jnp.float32)
        e1 = jnp.zeros((r, wp), jnp.float32)
        n0 = jnp.zeros((r, wp), jnp.float32)
        n1 = jnp.zeros((r, wp), jnp.float32)
    else:
        e0 = jnp.zeros((r, wp), jnp.float32)
        e1 = jnp.zeros((r, wp), jnp.float32)
        n0 = jnp.zeros((r, wp), jnp.float32)
        n1 = jnp.zeros((r, wp), jnp.float32)

    for s in range(n):
        mask = mask_full[s]              # [r, Wp]
        w_a = wext[s]
        w_b = wext[s + 1]
        if s < ref:
            a_r, b_r = w_a, ref_img
        else:
            a_r, b_r = ref_img, w_b

        # compile-time zero-weight elision: the per-offset weights are
        # STATIC Python floats, and a zero weight makes the whole term —
        # including its derivative stack — exact dead work that XLA will
        # not fold away (x * 0.0 is not strength-reduced for floats). The
        # production config omega=(0.0, 2.0) (cfgs/slow_flow.cfg) zeroes
        # the to-ref term on half the offsets; one_direction zeroes the
        # successive term on the past half (variational_mt.cpp:495-519
        # scales terms by these same per-frame weights).
        rs = p.rho[max(ref - s - 1, s - ref)]
        os_ = p.omega[max(ref - s - 1, s - ref)]
        succ_on = (rho_w[s] if mode == "assembly" else rs) != 0.0
        ref_on = (omega_w[s] if mode == "assembly" else os_) != 0.0

        # successive + to-reference derivative planes for this offset
        stacks = []
        for (pa, pb), on in (((w_a, w_b), succ_on), ((a_r, b_r), ref_on)):
            if not on:
                stacks.append(None)
                continue
            tmp = 0.5 * (pa + pb)
            izf = pa - pb
            if mode == "occ":
                stacks.append((izf, _c5x(izf), _c5y(izf)))
                continue
            ix = _c5x(tmp)
            iy = _c5y(tmp)
            # second same-direction convs clamp taps on the *plane*
            stacks.append((ix, iy, izf,
                           _c5x(_xrepl(ix, w_img)),
                           _c5y(ix),
                           _c5y(_yrepl(iy, grow0, h_img)),
                           _c5x(izf), _c5y(izf)))

        if mode == "occ":
            rho_s, om_s = rs, os_
            term = jnp.zeros((r, wp), jnp.float32)
            if succ_on:
                iz_s, ixz_s, iyz_s = (crop(t) for t in stacks[0])
                term = (term
                        + rho_s * hd * mask
                        * color_pen.apply((iz_s ** 2).sum(0))
                        + rho_s * hg * mask
                        * grad_pen.apply((ixz_s ** 2 + iyz_s ** 2).sum(0)))
            if ref_on:
                iz_r, ixz_r, iyz_r = (crop(t) for t in stacks[1])
                term = (term
                        + om_s * hd * mask
                        * color_pen.apply((iz_r ** 2).sum(0))
                        + om_s * hg * mask
                        * grad_pen.apply((ixz_r ** 2 + iyz_r ** 2).sum(0)))
            contrib = mask * (2.0 * rho_s + 2.0 * om_s)
            if s >= ref:     # future terms score label 0 (occluded in past)
                e0 = e0 + term
                n0 = n0 + contrib
            else:
                e1 = e1 + term
                n1 = n1 + contrib
            continue

        cropped = [tuple(crop(t) for t in st) if st is not None else None
                   for st in stacks]
        if cropped[0] is not None:
            (ix, iy, izf, ixx, ixy, iyy, ixz, iyz) = cropped[0]
        sref = cropped[1]

        if mode == "occ_assembly":
            # occlusion data costs from the SAME cropped derivative planes
            # the assembly below consumes (izf/ixz/iyz are the occ-mode
            # stacks, identical values and op order)
            term = jnp.zeros((r, wp), jnp.float32)
            if succ_on:
                term = (term
                        + rs * hd * mask
                        * color_pen.apply((izf ** 2).sum(0))
                        + rs * hg * mask
                        * grad_pen.apply((ixz ** 2 + iyz ** 2).sum(0)))
            if ref_on:
                izr_, ixzr_, iyzr_ = sref[2], sref[6], sref[7]
                term = (term
                        + os_ * hd * mask
                        * color_pen.apply((izr_ ** 2).sum(0))
                        + os_ * hg * mask
                        * grad_pen.apply((ixzr_ ** 2 + iyzr_ ** 2).sum(0)))
            contrib = mask * (2.0 * rs + 2.0 * os_)
            if s >= ref:     # future terms score label 0 (occluded in past)
                e0 = e0 + term
                n0 = n0 + contrib
            else:
                e1 = e1 + term
                n1 = n1 + contrib
            acc = acc_groups[1 if s >= ref else 0]

        a11, a12, a22, b1, b2 = acc
        # ---- successive data term (jacobian -Ix, -Iy) ----
        if p.delta != 0.0 and succ_on:
            t = cw * izf if zero_duv else cw * (izf - ix * du - iy * dv)
            if p.dataterm_norm:
                nn = ix * ix + iy * iy + DATANORM
                arg = (t * t / nn).sum(0)
                wgt = mask * (rho_w[s] * hd) * color_pen.derivative(arg)
                coef = wgt[None] * cw / nn
            else:
                arg = (t * t).sum(0)
                wgt = mask * (rho_w[s] * hd) * color_pen.derivative(arg)
                coef = wgt[None] * cw
            a11 = a11 + (coef * ix * ix).sum(0)
            a12 = a12 + (coef * ix * iy).sum(0)
            a22 = a22 + (coef * iy * iy).sum(0)
            b1 = b1 + (coef * izf * ix).sum(0)
            b2 = b2 + (coef * izf * iy).sum(0)
        if p.gamma != 0.0 and succ_on:
            if zero_duv:
                t1 = cw * ixz
                t2 = cw * iyz
            else:
                t1 = cw * (ixz - ixx * du - ixy * dv)
                t2 = cw * (iyz - ixy * du - iyy * dv)
            if p.dataterm_norm:
                n1_ = ixx * ixx + ixy * ixy + DATANORM
                n2_ = iyy * iyy + ixy * ixy + DATANORM
                arg = (t1 * t1 / n1_ + t2 * t2 / n2_).sum(0)
                wgt = mask * (rho_w[s] * hg) * grad_pen.derivative(arg)
                c1 = wgt[None] * cw / n1_
                c2 = wgt[None] * cw / n2_
            else:
                arg = (t1 * t1 + t2 * t2).sum(0)
                wgt = mask * (rho_w[s] * hg) * grad_pen.derivative(arg)
                c1 = c2 = wgt[None] * cw
            a11 = a11 + (c1 * ixx * ixx + c2 * ixy * ixy).sum(0)
            a12 = a12 + (c1 * ixx * ixy + c2 * ixy * iyy).sum(0)
            a22 = a22 + (c2 * iyy * iyy + c1 * ixy * ixy).sum(0)
            b1 = b1 + (c1 * ixx * ixz + c2 * ixy * iyz).sum(0)
            b2 = b2 + (c2 * iyy * iyz + c1 * ixy * ixz).sum(0)

        # ---- to-reference data term (jacobian scaled by signed factor) ----
        fac = fac_w[s]
        facsq = fac * fac
        if sref is not None:
            (ixr, iyr, izr, ixxr, ixyr, iyyr, ixzr, iyzr) = sref
        if p.delta != 0.0 and ref_on:
            t = cw * izr if zero_duv else \
                cw * (izr + ixr * fac * du + iyr * fac * dv)
            if p.dataterm_norm:
                nn = facsq * (ixr * ixr + iyr * iyr) + DATANORM
            else:
                nn = facsq + jnp.zeros_like(ixr)
            arg = (t * t / nn).sum(0)
            wgt = mask * (omega_w[s] * hd) * color_pen.derivative(arg)
            coef = wgt[None] * cw / nn
            b1 = b1 - (coef * fac * izr * ixr).sum(0)
            b2 = b2 - (coef * fac * izr * iyr).sum(0)
            a11 = a11 + (coef * facsq * ixr * ixr).sum(0)
            a12 = a12 + (coef * facsq * ixr * iyr).sum(0)
            a22 = a22 + (coef * facsq * iyr * iyr).sum(0)
        if p.gamma != 0.0 and ref_on:
            if zero_duv:
                t1 = cw * ixzr
                t2 = cw * iyzr
            else:
                t1 = cw * (ixzr + ixxr * fac * du + ixyr * fac * dv)
                t2 = cw * (iyzr + ixyr * fac * du + iyyr * fac * dv)
            if p.dataterm_norm:
                n1_ = facsq * (ixxr * ixxr + ixyr * ixyr) + DATANORM
                n2_ = facsq * (iyyr * iyyr + ixyr * ixyr) + DATANORM
            else:
                n1_ = n2_ = facsq + jnp.zeros_like(ixxr)
            arg = (t1 * t1 / n1_ + t2 * t2 / n2_).sum(0)
            wgt = mask * (omega_w[s] * hg) * grad_pen.derivative(arg)
            c1 = wgt[None] * cw / n1_
            c2 = wgt[None] * cw / n2_
            b1 = b1 - (c1 * fac * ixxr * ixzr + c2 * fac * ixyr * iyzr).sum(0)
            b2 = b2 - (c2 * fac * iyyr * iyzr + c1 * fac * ixyr * ixzr).sum(0)
            a11 = a11 + (c1 * facsq * ixxr * ixxr
                         + c2 * facsq * ixyr * ixyr).sum(0)
            a12 = a12 + (c1 * facsq * ixxr * ixyr
                         + c2 * facsq * ixyr * iyyr).sum(0)
            a22 = a22 + (c2 * facsq * iyyr * iyyr
                         + c1 * facsq * ixyr * ixyr).sum(0)
        acc = [a11, a12, a22, b1, b2]
        if mode == "occ_assembly":
            acc_groups[1 if s >= ref else 0] = acc

    if mode == "assembly":
        return acc
    n0 = jnp.where(n0 == 0, 1.0, n0)
    n1 = jnp.where(n1 == 0, 1.0, n1)
    occ_costs = [DT_SCALE_GRAPHC * e0 / n0,
                 DT_SCALE_GRAPHC * e1 / n1 + p.occlusion_penalty]
    if mode == "occ_assembly":
        return occ_costs + acc_groups[0] + acc_groups[1]
    return occ_costs


def _kernel(w_ref, mask_ref, du_ref, dv_ref, cw_ref, *out_refs,
            p, mode: str, r: int, wp: int, w_img: int, h_img: int,
            n_r: int, zero_duv: bool = False):
    """One row strip. w_ref: [1, F, 3, win_h, Wp] edge-replicated halo-4
    windows; mask_ref: [1, N, r, Wp] (gated for assembly, raw for occ);
    outputs are [1, r, Wp] planes."""
    from jax.experimental import pallas as pl

    # grid may be flattened over (batch, strip): strip = id % n_r
    grow0 = (pl.program_id(0) % n_r) * r - EXT
    outs = assemble_from_windows(
        w_ref[0], mask_ref[0], du_ref[0], dv_ref[0], cw_ref[0],
        p=p, mode=mode, r=r, wp=wp, w_img=w_img, h_img=h_img, grow0=grow0,
        zero_duv=zero_duv)
    for ref_out, val in zip(out_refs, outs):
        ref_out[0] = val


def fused_data_system_batched(warped, mask, du, dv, channel_w, p,
                              mode="assembly", r: int = R_STRIP,
                              interpret: bool = False,
                              zero_duv: bool = False):
    """Batched fused assembly: warped [B, 2*ref+1, 3, H, W], mask
    [B, 2*ref, H, W], du/dv [B, H, W], channel_w [B, 3, H, W]. The jet batch
    flattens into the strip grid (B * n_strips steps, identical per-strip
    blocks), so one dispatch covers the whole batch.

    mode="assembly" -> (a11, a12, a22, b1, b2) each [B, H, W];
    mode="occ" -> (e0, e1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, c, h, w = warped.shape
    n = 2 * p.ref
    r = min(r, _round_up(h, 8))
    n_r = -(-h // r)
    hp = n_r * r
    wp = _round_up(w + 2 * EXT, 128)
    win_h = r + 2 * EXT
    nb = b * n_r

    # halo-4 edge-replicated strip windows: static slices, no gather
    wpad = jnp.pad(warped, ((0, 0), (0, 0), (0, 0),
                            (EXT, EXT + hp - h + EXT), (EXT, wp - w - EXT)),
                   mode="edge")
    windows = jnp.stack([wpad[:, :, :, s * r:s * r + win_h, :]
                         for s in range(n_r)],
                        axis=1)               # [B, n_r, F, 3, win_h, Wp]
    windows = windows.reshape(nb, f, c, win_h, wp)

    def padp(a, fill=0.0):
        pads = [(0, 0)] * (a.ndim - 2) + [(0, hp - h), (0, wp - w)]
        return jnp.pad(a, pads, constant_values=fill)

    mask_p = padp(mask).reshape(b, n, n_r, r, wp) \
        .transpose(0, 2, 1, 3, 4).reshape(nb, n, r, wp)
    du_p = padp(du).reshape(nb, r, wp)
    dv_p = padp(dv).reshape(nb, r, wp)
    cw_p = padp(channel_w).reshape(b, c, n_r, r, wp) \
        .transpose(0, 2, 1, 3, 4).reshape(nb, c, r, wp)

    pspec = pl.BlockSpec((1, r, wp), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM)
    n_out = {"assembly": 5, "occ": 2, "occ_assembly": 12}[mode]
    outs = pl.pallas_call(
        partial(_kernel, p=p, mode=mode, r=r, wp=wp, w_img=w, h_img=h,
                n_r=n_r, zero_duv=zero_duv),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, f, c, win_h, wp), lambda s: (s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, r, wp),
                         lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM),
            pspec, pspec,
            pl.BlockSpec((1, c, r, wp), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pspec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((nb, r, wp), jnp.float32),) * n_out,
        interpret=interpret,
    )(windows, mask_p, du_p, dv_p, cw_p)
    return tuple(o.reshape(b, hp, wp)[:, :h, :w] for o in outs)


def fused_data_system(warped, mask, du, dv, channel_w, p, mode="assembly",
                      r: int = R_STRIP, interpret: bool = False,
                      zero_duv: bool = False):
    """warped: [2*ref+1, 3, H, W]; mask: [2*ref, H, W] (gated for assembly,
    raw for occ); du/dv: [H, W]; channel_w: [3, H, W].

    mode="assembly" -> (a11, a12, a22, b1, b2); mode="occ" -> (e0, e1)."""
    outs = fused_data_system_batched(
        warped[None], mask[None], du[None], dv[None], channel_w[None], p,
        mode=mode, r=r, interpret=interpret, zero_duv=zero_duv)
    return tuple(o[0] for o in outs)
