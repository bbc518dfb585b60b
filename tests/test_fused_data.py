"""The fused derivative+assembly kernel (variational/fused_data.py) must
reproduce the XLA path (get_derivatives_mt + add_data_terms /
occlusion_data_costs) to float rounding, including conv edge clamping.

Interpret mode on CPU; the Mosaic path is exercised by the benchmark.
"""
import numpy as np
import jax.numpy as jnp
import pytest

# The whole module compiles large Pallas-interpret XLA:CPU executables: the
# persistent compilation cache crashes natively on this class on BOTH the
# write (zstd serialize) and read (deserialize) paths — keep it off here
# (see conftest._nocache_compilation).
pytestmark = [pytest.mark.nocache, pytest.mark.slow]


from slowflow_tpu.core.warp import warp_bilinear
from slowflow_tpu.variational.fused_data import fused_data_system
from slowflow_tpu.variational.multiframe import (
    MultiFrameParams, add_data_terms, get_derivatives_mt,
    occlusion_data_costs, variational_mt)

H, W, REF = 49, 75, 2
F = 2 * REF + 1


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255
    wx = jnp.asarray(rng.random((H, W)) * 1.5, jnp.float32)
    wy = jnp.asarray(rng.random((H, W)) * -1.2, jnp.float32)
    du = jnp.asarray(rng.random((H, W)) * 0.3, jnp.float32)
    dv = jnp.asarray(rng.random((H, W)) * 0.2, jnp.float32)
    cw = jnp.asarray(rng.random((3, H, W)) + 0.5, jnp.float32)
    succ, to_ref, mask = get_derivatives_mt(seq, wx, wy, REF,
                                            warp_mode="banded")
    gate = jnp.asarray(rng.random((2 * REF, H, W)) > 0.3, jnp.float32)
    pairs = [warp_bilinear(seq[k], wx, wy, factor=float(k - REF))
             for k in range(F)]
    warped = jnp.stack([o for o, _ in pairs]).at[REF].set(seq[REF])
    return seq, warped, succ, to_ref, mask, gate, du, dv, cw


@pytest.mark.parametrize("kwargs", [
    dict(),                                        # normalized, symmetric
    dict(dataterm_norm=False, one_direction=True),
    dict(delta=0.0),                               # gradient-only
    dict(gamma=0.0),                               # color-only
])
def test_assembly_matches_xla(setup, kwargs):
    _, warped, succ, to_ref, mask, gate, du, dv, cw = setup
    p = MultiFrameParams(S=3, rho=(1.0, 0.8), omega=(0.5, 2.0), layers=1,
                         smoothing=1, occlusion_reasoning=True, **kwargs)
    gm = mask * gate
    want = add_data_terms(du, dv, gm, succ, to_ref, cw, p)
    got = fused_data_system(warped, gm, du, dv, cw, p, mode="assembly",
                            interpret=True)
    for name, a, b in zip(["a11", "a12", "a22", "b1", "b2"], got, want):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-5, err_msg=name)


def test_occ_costs_match_xla(setup):
    _, warped, succ, to_ref, mask, _, du, dv, cw = setup
    p = MultiFrameParams(S=3, rho=(1.0, 0.8), omega=(0.5, 2.0), layers=1)
    want = occlusion_data_costs(mask, succ, to_ref, p)
    got = fused_data_system(warped, mask, du, dv, cw, p, mode="occ",
                            interpret=True)
    for name, a, b in zip(["e0", "e1"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5, err_msg=name)


def test_batched_matches_per_item(setup):
    """fused_data_system_batched flattens the jet batch into the strip grid;
    every per-strip block is identical to the unbatched kernel's, so the
    outputs must match bitwise."""
    from slowflow_tpu.variational.fused_data import fused_data_system_batched

    _, warped, _, _, mask, gate, du, dv, cw = setup
    p = MultiFrameParams(S=3, rho=(1.0, 0.8), omega=(0.5, 2.0), layers=1,
                         smoothing=1, occlusion_reasoning=True)
    B = 3
    rng = np.random.default_rng(5)
    scale = jnp.asarray(1.0 + 0.1 * np.arange(B), jnp.float32)
    wb = warped[None] * scale[:, None, None, None, None]
    mb = jnp.broadcast_to(mask * gate, (B,) + mask.shape)
    dub = jnp.asarray(rng.normal(0, 0.2, (B, H, W)), jnp.float32)
    dvb = jnp.asarray(rng.normal(0, 0.2, (B, H, W)), jnp.float32)
    cwb = jnp.broadcast_to(cw, (B,) + cw.shape)
    for mode in ("assembly", "occ"):
        outb = fused_data_system_batched(wb, mb, dub, dvb, cwb, p,
                                         mode=mode, interpret=True)
        for i in range(B):
            outs = fused_data_system(wb[i], mb[i], dub[i], dvb[i], cwb[i],
                                     p, mode=mode, interpret=True)
            for a, b in zip(outb, outs):
                np.testing.assert_array_equal(np.asarray(a[i]),
                                              np.asarray(b),
                                              err_msg=f"{mode} item {i}")


def test_end_to_end_fused_equals_unfused():
    """Full coarse-to-fine solve: the fused path must agree with the XLA
    path to reassociation noise on a real translating scene."""
    from dataclasses import replace

    rng = np.random.default_rng(1)
    base = rng.random((H + 40, W + 40)).astype(np.float32) * 255
    for _ in range(3):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    yy, xx = np.mgrid[0:H, 0:W]
    seq = []
    for s in range(-(REF), REF + 1):
        xs = np.clip(xx + 20 - s * 1.3, 0, W + 38)
        ys = np.clip(yy + 20 - s * 0.7, 0, H + 38)
        x0 = xs.astype(int); y0 = ys.astype(int)
        fx = xs - x0; fy = ys - y0
        im = (base[y0, x0] * (1 - fx) * (1 - fy)
              + base[y0, x0 + 1] * fx * (1 - fy)
              + base[y0 + 1, x0] * (1 - fx) * fy
              + base[y0 + 1, x0 + 1] * fx * fy)
        seq.append(np.repeat(im[None], 3, 0))
    seq = jnp.asarray(np.stack(seq))
    z = jnp.zeros((H, W))
    p = MultiFrameParams(S=3, rho=(1.0, 1.0), omega=(0.0, 2.0), layers=2,
                         p_scale=0.8, niter_alter=3, niter_outer=4,
                         niter_solver=15, occlusion_reasoning=True,
                         smoothing=1)
    fused = variational_mt(z, z, seq, p)
    plain = variational_mt(z, z, seq, replace(p, fused_data=False))
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(plain[0]),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(plain[1]),
                               rtol=0, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fused[2]), np.asarray(plain[2]))
    # and it recovered the true motion
    assert abs(float(np.median(np.asarray(fused[0])[8:-8, 8:-8])) - 1.3) < 0.1
    assert abs(float(np.median(np.asarray(fused[1])[8:-8, 8:-8])) - 0.7) < 0.1
