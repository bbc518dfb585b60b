"""Equivalence of the merged warp+assembly kernel (variational/fused_warp.py)
against the two-kernel composition it replaces: core/warp_shift.py's
warp_stack_auto -> variational/fused_data.py's fused_data_system.

The merged kernel recomputes the bilinear corner indices in-kernel from the
flow strip and rebuilds the conv halos with the _xrepl/_yrepl edge
replication instead of jnp.pad; in-image math is the identical f32 sequence,
so agreement should be at rounding level for every ladder variant and exact
when both sides take the banded fallback.
"""
import numpy as np
import pytest

# The whole module compiles large Pallas-interpret XLA:CPU executables: the
# persistent compilation cache crashes natively on this class on BOTH the
# write (zstd serialize) and read (deserialize) paths — keep it off here
# (see conftest._nocache_compilation).
pytestmark = [pytest.mark.nocache, pytest.mark.slow]



import jax.numpy as jnp

from slowflow_tpu.variational.fused_data import fused_data_system
from slowflow_tpu.variational.fused_warp import (fused_warp_data,
                                                 fused_warp_data_batched)
from slowflow_tpu.variational.multiframe import MultiFrameParams
from slowflow_tpu.core.warp_shift import warp_stack_auto


def _problem(h, w, flow_scale, seed=0, S=3, flow_bias=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    f = 2 * (S - 1) + 1
    seq = jnp.asarray(rng.random((f, 3, h, w)) * 255, jnp.float32)
    # smooth flow so strips stay coherent (like real jets)
    wx = rng.normal(0, 1, (h // 8 + 2, w // 8 + 2))
    wy = rng.normal(0, 1, (h // 8 + 2, w // 8 + 2))
    wx = np.kron(wx, np.ones((8, 8)))[:h, :w] * flow_scale + flow_bias[0]
    wy = np.kron(wy, np.ones((8, 8)))[:h, :w] * flow_scale + flow_bias[1]
    wx = jnp.asarray(wx, jnp.float32)
    wy = jnp.asarray(wy, jnp.float32)
    du = jnp.asarray(rng.normal(0, 0.2, (h, w)), jnp.float32)
    dv = jnp.asarray(rng.normal(0, 0.2, (h, w)), jnp.float32)
    cw = jnp.asarray(0.5 + rng.random((3, h, w)), jnp.float32)
    mask = jnp.asarray(rng.random((2 * (S - 1), h, w)) > 0.1, jnp.float32)
    return seq, wx, wy, mask, du, dv, cw


def _reference(seq, wx, wy, mask, du, dv, cw, p, mode):
    ref = p.ref
    warped, _ = warp_stack_auto(seq, wx, wy, ref, interpret=True)
    return fused_data_system(warped, mask, du, dv, cw, p, mode=mode,
                             interpret=True)


P = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                     rho=(1.0, 1.0), omega=(0.0, 2.0),
                     occlusion_reasoning=True, smoothing=1)


@pytest.mark.parametrize("mode", ["assembly", "occ"])
@pytest.mark.parametrize("flow_scale,bias,tol", [
    # tiny motion: both sides take a shift variant -> identical f32 op
    # sequence, rounding-level agreement
    (0.3, (0.0, 0.0), 2e-4),
    # larger iid-random flows: the merged kernel's GLOBAL anchor keeps it
    # on a shift rung while warp_stack_auto's per-strip ladder falls back
    # to the banded warp — two exact bilinear implementations whose f32
    # summation orders differ, amplified by the IRLS assembly products
    (1.2, (1.5, -0.8), 4e-3),
    (2.4, (2.0, 1.0), 8e-3),
])
def test_merged_matches_two_kernel(mode, flow_scale, bias, tol):
    seq, wx, wy, mask, du, dv, cw = _problem(45, 61, flow_scale,
                                             seed=3, flow_bias=bias)
    want = _reference(seq, wx, wy, mask, du, dv, cw, P, mode)
    got = fused_warp_data(seq, wx, wy, mask, du, dv, cw, P, mode=mode,
                          interpret=True)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=5e-4, atol=tol)


def _explicit_masks(wx, wy, occ, p, h, w):
    """What the self-masking kernel must reproduce: succ masks from warp
    coordinates + compute_one_level's occlusion gate."""
    from slowflow_tpu.core.warp_shift import _coords
    from slowflow_tpu.variational.multiframe import succ_mask

    ref = p.ref
    f = 2 * ref + 1
    factors = jnp.arange(f, dtype=jnp.float32) - ref
    inside = _coords(wx, wy, factors, h, w)[-1].astype(jnp.float32)
    m = succ_mask(inside, ref)
    data_norm = float(sum(p.rho[s] + p.omega[s] for s in range(ref)))
    factor = (1.0 + (occ == 0.0)) * data_norm
    backward = (occ >= 0.0) / factor
    forward = (occ <= 0.0) / factor
    s_ix = jnp.arange(2 * ref)[:, None, None]
    gate = jnp.where(s_ix < ref, backward[None], forward[None])
    return m, m * gate


@pytest.mark.parametrize("flow_scale,bias", [
    (0.3, (0.0, 0.0)),          # shift rung
    (1.0, (14.0, -11.0)),       # banded fallback
])
def test_self_mask_matches_explicit(flow_scale, bias):
    """mask=None + occ plane must equal the precomputed-mask call for both
    modes, on the kernel rungs and the banded fallback."""
    h, w = 45, 61
    seq, wx, wy, _, du, dv, cw = _problem(h, w, flow_scale, seed=6,
                                          flow_bias=bias)
    rng = np.random.default_rng(9)
    occ = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], size=(h, w)), jnp.float32)
    raw, gated = _explicit_masks(wx, wy, occ, P, h, w)

    want = fused_warp_data(seq, wx, wy, gated, du, dv, cw, P,
                           mode="assembly", interpret=True)
    got = fused_warp_data(seq, wx, wy, None, du, dv, cw, P,
                          mode="assembly", interpret=True, occ=occ)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=1e-5, atol=1e-4)

    z = jnp.zeros_like(wx)
    want_o = fused_warp_data(seq, wx, wy, raw, z, z, cw, P, mode="occ",
                             interpret=True)
    got_o = fused_warp_data(seq, wx, wy, None, z, z, cw, P, mode="occ",
                            interpret=True, occ=occ)
    for g, wv in zip(got_o, want_o):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.nocache  # full merged-warp solve: the persistent compilation-
# cache write of this executable class segfaults on this host (verdict r4)
def test_self_mask_full_solve_equivalence():
    """variational_mt with self_mask=True must match the default route."""
    from dataclasses import replace

    from slowflow_tpu.variational.multiframe import variational_mt

    h, w = 32, 40
    rng = np.random.default_rng(11)
    seq = jnp.asarray(rng.random((5, 3, h, w)).astype(np.float32))
    p = replace(P, layers=2, niter_alter=2, niter_outer=3, niter_solver=6,
                merge_warp=True)
    wx = jnp.zeros((h, w), jnp.float32)
    base = variational_mt(wx, wx, seq, p)
    self_m = variational_mt(wx, wx, seq, replace(p, self_mask=True))
    np.testing.assert_allclose(self_m[0], base[0], rtol=0, atol=1e-4)
    np.testing.assert_allclose(self_m[1], base[1], rtol=0, atol=1e-4)
    assert (np.asarray(self_m[2]) != np.asarray(base[2])).mean() < 0.01


def test_merged_strip_r_equivalence():
    """The strip height is a pure grid knob: any r must produce the same
    planes (the warp-variant ladder fits on global spans, not per strip)."""
    seq, wx, wy, mask, du, dv, cw = _problem(45, 61, 0.9, seed=4,
                                             flow_bias=(1.0, -0.5))
    want = fused_warp_data(seq, wx, wy, mask, du, dv, cw, P, interpret=True)
    for r in (16, 48):
        got = fused_warp_data(seq, wx, wy, mask, du, dv, cw, P, r=r,
                              interpret=True)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       rtol=1e-6, atol=1e-5)


def test_merged_fallback_on_large_motion():
    # |flow| far beyond every ladder entry: both sides take the banded warp
    seq, wx, wy, mask, du, dv, cw = _problem(40, 48, 1.0, seed=5,
                                             flow_bias=(14.0, -11.0))
    want = _reference(seq, wx, wy, mask, du, dv, cw, P, "assembly")
    got = fused_warp_data(seq, wx, wy, mask, du, dv, cw, P, interpret=True)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=2e-5, atol=2e-4)


def test_merged_batched_matches_per_item():
    b = 3
    items = [_problem(37, 52, 0.9, seed=10 + i, flow_bias=(1.0, -0.5))
             for i in range(b)]
    stacked = [jnp.stack([it[j] for it in items]) for j in range(7)]
    outs = fused_warp_data_batched(*stacked, P, interpret=True)
    for i, it in enumerate(items):
        want = fused_warp_data(*it, P, interpret=True)
        for g, wv in zip(outs, want):
            np.testing.assert_allclose(np.asarray(g[i]), np.asarray(wv),
                                       rtol=2e-5, atol=2e-4)


def test_merged_occ_mode_masks_raw():
    # occ mode with an all-ones mask on a constant-motion scene: the energy
    # planes must be finite and the to-reference terms dominated by motion
    seq, wx, wy, mask, du, dv, cw = _problem(40, 48, 0.0, seed=7,
                                             flow_bias=(1.0, 0.0))
    e0, e1 = fused_warp_data(seq, wx, wy, jnp.ones_like(mask),
                             jnp.zeros_like(du), jnp.zeros_like(dv), cw,
                             P, mode="occ", interpret=True)
    assert np.isfinite(np.asarray(e0)).all()
    assert np.isfinite(np.asarray(e1)).all()


def test_occ_assembly_mode_equivalence():
    """The combined occ_assembly mode (one dispatch per alternation) must
    reproduce the occ-mode costs BITWISE (identical op order on the same
    derivative planes) and, after post-hoc gating, the assembly-mode system
    to float-reassociation level — the occlusion gate multiplies the data
    weight linearly and is constant per past/future group
    (compute_one_level.gate_masks, variational_mt.cpp:292-320)."""
    rng = np.random.default_rng(13)
    h, w = 40, 48
    seq, wx, wy, _, du, dv, cw = _problem(h, w, 0.4, seed=13,
                                          flow_bias=(0.8, -0.4))
    z = jnp.zeros((h, w), jnp.float32)
    occ = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], (h, w)), jnp.float32)

    outs = fused_warp_data(seq, wx, wy, None, z, z, cw, P,
                           mode="occ_assembly", interpret=True,
                           zero_duv=True, occ=z)
    e0c, e1c = outs[0], outs[1]
    sys_b, sys_f = outs[2:7], outs[7:12]

    e0, e1 = fused_warp_data(seq, wx, wy, None, z, z, cw, P, mode="occ",
                             interpret=True, occ=z)
    np.testing.assert_array_equal(np.asarray(e0c), np.asarray(e0))
    np.testing.assert_array_equal(np.asarray(e1c), np.asarray(e1))

    asm = fused_warp_data(seq, wx, wy, None, z, z, cw, P, mode="assembly",
                          interpret=True, zero_duv=True, occ=occ)
    data_norm = float(sum(P.rho[s] + P.omega[s] for s in range(P.ref)))
    factor = (1.0 + (occ == 0.0)) * data_norm
    backward = (occ >= 0.0) / factor
    forward = (occ <= 0.0) / factor
    for i, name in enumerate(("a11", "a12", "a22", "b1", "b2")):
        comb = backward * sys_b[i] + forward * sys_f[i]
        np.testing.assert_allclose(np.asarray(comb), np.asarray(asm[i]),
                                   rtol=2e-5, atol=2e-4, err_msg=name)


@pytest.mark.nocache  # compiles merged-warp full-solve executables (the
# persistent compilation-cache writer segfaults on this class; verdict r4)
def test_fuse_occ_full_solve_equivalence():
    """variational_mt with fuse_occ=True (combined occ+assembly dispatch +
    peeled first outer iteration) must match the fuse_occ=False route."""
    from dataclasses import replace

    from slowflow_tpu.variational.multiframe import variational_mt

    h, w = 32, 40
    rng = np.random.default_rng(11)
    seq = jnp.asarray(rng.random((5, 3, h, w)).astype(np.float32))
    p = replace(P, layers=2, niter_alter=2, niter_outer=3, niter_solver=6,
                merge_warp=True, self_mask=True, fuse_occ=False)
    wx = jnp.zeros((h, w), jnp.float32)
    base = variational_mt(wx, wx, seq, p)
    fused = variational_mt(wx, wx, seq, replace(p, fuse_occ=True))
    np.testing.assert_allclose(fused[0], base[0], rtol=0, atol=1e-4)
    np.testing.assert_allclose(fused[1], base[1], rtol=0, atol=1e-4)
    assert (np.asarray(fused[2]) != np.asarray(base[2])).mean() < 0.01
