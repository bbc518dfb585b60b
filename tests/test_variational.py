import numpy as np
import jax.numpy as jnp
import pytest

from slowflow_tpu.variational import (
    TwoFrameParams, variational_twoframe, MultiFrameParams, variational_mt,
)
from slowflow_tpu.variational.multiframe import solve_binary_potts
from slowflow_tpu.core.warp import warp_bilinear


def make_pattern(h, w, seed=0):
    """Smooth random texture (so the linearization is informative)."""
    rng = np.random.default_rng(seed)
    big = rng.random((h + 8, w + 8)) * 255
    k = np.ones(5) / 5
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, big)
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
    return big[4:4 + h, 4:4 + w].astype(np.float32)


def shifted_pair(h, w, dx, dy):
    """im1 and im2 where im2 is im1 translated by (dx, dy)."""
    base = make_pattern(h + 16, w + 16)
    im1 = base[8:8 + h, 8:8 + w]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # sample base at (x + 8 - dx, y + 8 - dy): flow from im1 to im2 is (dx, dy)
    xs = np.clip(xx + 8 - dx, 0, w + 15)
    ys = np.clip(yy + 8 - dy, 0, h + 15)
    x0 = np.floor(xs).astype(int); y0 = np.floor(ys).astype(int)
    fx = xs - x0; fy = ys - y0
    x1 = np.clip(x0 + 1, 0, w + 15); y1 = np.clip(y0 + 1, 0, h + 15)
    im2 = (base[y0, x0] * (1 - fx) * (1 - fy) + base[y0, x1] * fx * (1 - fy)
           + base[y1, x0] * (1 - fx) * fy + base[y1, x1] * fx * fy)
    to3 = lambda im: np.repeat(im[None], 3, axis=0).astype(np.float32)
    return to3(im1), to3(im2.astype(np.float32))


def test_twoframe_recovers_small_translation():
    h, w = 40, 48
    dx, dy = 0.8, -0.6
    im1, im2 = shifted_pair(h, w, dx, dy)
    wx = jnp.zeros((h, w)); wy = jnp.zeros((h, w))
    params = TwoFrameParams(alpha=1.0, gamma=0.72, delta=0.0, niter_outer=8)
    wx, wy = variational_twoframe(wx, wy, jnp.asarray(im1), jnp.asarray(im2),
                                  params)
    interior = (slice(8, -8), slice(8, -8))
    err = np.hypot(np.asarray(wx)[interior] - dx, np.asarray(wy)[interior] - dy)
    assert np.mean(err) < 0.25, np.mean(err)


def test_twoframe_refines_good_init():
    """Refinement must not destroy a correct initialization."""
    h, w = 32, 32
    dx, dy = 1.6, 0.9
    im1, im2 = shifted_pair(h, w, dx, dy)
    wx = jnp.full((h, w), dx); wy = jnp.full((h, w), dy)
    params = TwoFrameParams(niter_outer=3)
    wx, wy = variational_twoframe(wx, wy, jnp.asarray(im1), jnp.asarray(im2),
                                  params)
    interior = (slice(6, -6), slice(6, -6))
    err = np.hypot(np.asarray(wx)[interior] - dx, np.asarray(wy)[interior] - dy)
    assert np.mean(err) < 0.15, np.mean(err)


def _window_sequence(h, w, dx, dy, S):
    """2*(S-1)+1 frames moving with constant velocity (dx, dy) per step."""
    ref = S - 1
    base = make_pattern(h + 40, w + 40, seed=3)
    frames = []
    for s in range(-ref, ref + 1):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        xs = np.clip(xx + 20 - s * dx, 0, w + 39)
        ys = np.clip(yy + 20 - s * dy, 0, h + 39)
        x0 = np.floor(xs).astype(int); y0 = np.floor(ys).astype(int)
        fx = xs - x0; fy = ys - y0
        x1 = np.clip(x0 + 1, 0, w + 39); y1 = np.clip(y0 + 1, 0, h + 39)
        im = (base[y0, x0] * (1 - fx) * (1 - fy) + base[y0, x1] * fx * (1 - fy)
              + base[y1, x0] * (1 - fx) * fy + base[y1, x1] * fx * fy)
        frames.append(np.repeat(im[None], 3, axis=0))
    return np.stack(frames).astype(np.float32)


@pytest.mark.parametrize("occlusion_reasoning", [False, True])
def test_multiframe_recovers_translation(occlusion_reasoning):
    h, w, S = 36, 40, 3
    dx, dy = 0.7, -0.4
    seq = _window_sequence(h, w, dx, dy, S)
    p = MultiFrameParams(
        S=S, alpha=4.0, gamma=6.0, delta=1.0, rho=(1.0, 1.0), omega=(0.0, 2.0),
        layers=1, niter_alter=2 if occlusion_reasoning else 1,
        niter_outer=6, niter_inner=1, niter_solver=30,
        occlusion_reasoning=occlusion_reasoning, smoothing=1,
    )
    wx = jnp.zeros((h, w)); wy = jnp.zeros((h, w))
    wx, wy, occ = variational_mt(wx, wy, seq, p)
    interior = (slice(8, -8), slice(8, -8))
    err = np.hypot(np.asarray(wx)[interior] - dx, np.asarray(wy)[interior] - dy)
    assert np.mean(err) < 0.3, np.mean(err)
    assert occ.shape == (h, w)


def test_multiframe_pyramid_runs():
    h, w, S = 40, 44, 2
    dx, dy = 1.2, 0.5
    seq = _window_sequence(h, w, dx, dy, S)
    p = MultiFrameParams(S=S, rho=(1.0,), omega=(1.0,), layers=3, p_scale=0.8,
                         niter_alter=1, niter_outer=4, occlusion_reasoning=False)
    wx, wy, _ = variational_mt(jnp.zeros((h, w)), jnp.zeros((h, w)), seq, p)
    interior = (slice(10, -10), slice(10, -10))
    err = np.hypot(np.asarray(wx)[interior] - dx, np.asarray(wy)[interior] - dy)
    assert np.mean(err) < 0.5, np.mean(err)


def test_binary_potts_prefers_data():
    """With zero smoothness, ICM must return the data argmin."""
    rng = np.random.default_rng(0)
    e0 = rng.random((10, 10)).astype(np.float32)
    e1 = rng.random((10, 10)).astype(np.float32)
    lab = np.asarray(solve_binary_potts(jnp.asarray(e0), jnp.asarray(e1),
                                        0.0, 5))
    np.testing.assert_array_equal(lab, (e1 < e0).astype(np.float32))


def test_binary_potts_smooths_noise():
    """Strong Potts coupling flips isolated disagreeing pixels."""
    e0 = np.zeros((12, 12), np.float32)
    e1 = np.ones((12, 12), np.float32) * 0.1
    # one pixel strongly prefers label 1, neighbors prefer 0
    e1[6, 6] = -0.2
    lab = np.asarray(solve_binary_potts(jnp.asarray(e0), jnp.asarray(e1),
                                        1.0, 10))
    assert lab.sum() == 0  # smoothness wins over the isolated preference
