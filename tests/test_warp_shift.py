"""Small-motion shift warp (core/warp_shift.py) vs the banded one-hot warp.

Runs the pallas kernel in interpreter mode on CPU; the Mosaic TPU path is
exercised by the benchmark. The shift path computes the exact f32 4-corner
bilinear sample, so it may differ from the Precision.HIGH banded matmul by
~1e-4 image units; the fallback branch must match the banded path exactly.
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
from slowflow_tpu.core.warp_shift import warp_stack_auto

H, W, REF = 70, 90, 2
F = 2 * REF + 1


def _seq(rng):
    return jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255.0


def _check(seq, wx, wy, atol):
    warped, masks = warp_stack_auto(seq, wx, wy, REF, interpret=True)
    for k in range(F):
        o, m = warp_bilinear(seq[k], wx, wy, factor=float(k - REF))
        np.testing.assert_allclose(np.asarray(warped[k]), np.asarray(o),
                                   rtol=0, atol=atol, err_msg=f"frame {k}")
        np.testing.assert_array_equal(np.asarray(masks[k]), np.asarray(m))


def test_smooth_small_flow(rng):
    wx = jnp.asarray(np.sin(np.linspace(0, 3, H))[:, None]
                     * np.ones(W) * 1.5, jnp.float32)
    wy = jnp.asarray(np.cos(np.linspace(0, 2, W))[None, :]
                     * np.ones((H, 1)) * 1.2, jnp.float32)
    _check(_seq(rng), wx, wy, atol=1e-4)


def test_layered_flow_occlusion_boundary(rng):
    wx = np.zeros((H, W), np.float32)
    wy = np.zeros((H, W), np.float32)
    wx[20:40, 30:60] = 3.0
    wy[20:40, 30:60] = -2.0
    _check(_seq(rng), jnp.asarray(wx), jnp.asarray(wy), atol=1e-4)


def test_large_flow_falls_back_to_banded(rng):
    wx = jnp.asarray(np.sin(np.linspace(0, 3, H))[:, None]
                     * np.ones(W) * 30.0, jnp.float32)
    wy = jnp.asarray(np.ones((H, W)) * -18.0, jnp.float32)
    # the fallback IS warp_bilinear, so agreement must be exact
    _check(_seq(rng), wx, wy, atol=0.0)


def test_negative_and_fractional_flow(rng):
    wx = jnp.asarray(np.full((H, W), -2.3, np.float32))
    wy = jnp.asarray(np.full((H, W), 1.7, np.float32))
    _check(_seq(rng), wx, wy, atol=1e-4)


def test_out_of_bounds_masking(rng):
    # push samples beyond every border; masks must match and values agree
    wx = jnp.asarray(np.linspace(-4, 4, W)[None, :]
                     * np.ones((H, 1)), jnp.float32)
    wy = jnp.asarray(np.linspace(3, -3, H)[:, None]
                     * np.ones(W), jnp.float32)
    _check(_seq(rng), wx, wy, atol=1e-4)


def test_batched_matches_per_item(rng):
    """warp_stack_auto_batched (jet batch flattened into the kernel grid)
    must reproduce per-item warp_stack_auto, including the masks."""
    from slowflow_tpu.core.warp_shift import warp_stack_auto_batched

    B = 3
    seq = jnp.asarray(rng.random((B, F, 3, H, W)), jnp.float32) * 255.0
    wx = jnp.asarray(rng.normal(0, 1.2, (B, H, W)), jnp.float32)
    wy = jnp.asarray(rng.normal(0, 0.8, (B, H, W)), jnp.float32)
    wb, mb = warp_stack_auto_batched(seq, wx, wy, REF, interpret=True)
    for i in range(B):
        ws, ms = warp_stack_auto(seq[i], wx[i], wy[i], REF, interpret=True)
        np.testing.assert_allclose(np.asarray(wb[i]), np.asarray(ws),
                                   rtol=0, atol=2e-5, err_msg=f"item {i}")
        np.testing.assert_array_equal(np.asarray(mb[i]), np.asarray(ms))


def test_derivative_stack_shift_matches_banded(rng):
    from slowflow_tpu.variational.multiframe import get_derivatives_mt

    seq = _seq(rng)
    wx = jnp.asarray(np.full((H, W), 1.3, np.float32))
    wy = jnp.asarray(np.full((H, W), -0.6, np.float32))
    s_a, r_a, m_a = get_derivatives_mt(seq, wx, wy, REF, warp_mode="shift")
    s_b, r_b, m_b = get_derivatives_mt(seq, wx, wy, REF, warp_mode="banded")
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    for key in s_a:
        np.testing.assert_allclose(np.asarray(s_a[key]), np.asarray(s_b[key]),
                                   rtol=0, atol=5e-4, err_msg=f"succ {key}")
        np.testing.assert_allclose(np.asarray(r_a[key]), np.asarray(r_b[key]),
                                   rtol=0, atol=5e-4, err_msg=f"ref {key}")
