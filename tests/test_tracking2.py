import numpy as np
import jax.numpy as jnp

from slowflow_tpu.tracking.accumulate import forward_backward_consistency
from slowflow_tpu.tracking.hypothesis import (
    complete_hypothesis, perturb_hypothesis,
)
from slowflow_tpu.utils.segments import remove_small_segments


def test_remove_small_segments():
    F = np.zeros((30, 40), np.int32)
    F[5:25, 5:35] = 1          # big segment: 600 px, survives
    F[27:29, 2:4] = 1          # tiny segment: 4 px, removed
    valid = remove_small_segments(F, 0.1, 100)
    assert F[10, 10] == 1
    assert F[27, 2] == 0
    assert valid[27, 2] == 0
    assert valid[10, 10] == 255


def test_complete_hypothesis_linear():
    J = 6
    flows = np.zeros((2, J, 2), np.float32)
    # constant velocity (2, -1) observed for first 3 jets; rest garbage
    flows[:, :, 0] = 2.0 * np.arange(1, J + 1)
    flows[:, :, 1] = -1.0 * np.arange(1, J + 1)
    flows[:, 3:, :] = 999.0
    out = complete_hypothesis(flows, 0, 3, np.zeros(2), np.zeros(2),
                              approach=0)
    np.testing.assert_allclose(out[0, :, 0], 2.0 * np.arange(1, J + 1),
                               atol=1e-4)
    np.testing.assert_allclose(out[0, :, 1], -1.0 * np.arange(1, J + 1),
                               atol=1e-4)


def test_complete_hypothesis_quadratic():
    J = 6
    t = np.arange(1, J + 1, dtype=np.float64)
    flows = np.zeros((1, J, 2), np.float32)
    flows[0, :, 0] = 0.5 * t + 0.25 * t * t
    flows[0, :, 1] = t
    out = complete_hypothesis(flows, 0, 4, np.zeros(1), np.zeros(1),
                              approach=1)
    np.testing.assert_allclose(out[0, :, 0], 0.5 * t + 0.25 * t * t, atol=1e-3)


def test_complete_hypothesis_too_short():
    flows = np.zeros((1, 4, 2), np.float32)
    assert complete_hypothesis(flows, 0, 0, np.zeros(1), np.zeros(1), 0) is None


def test_perturb_hypothesis():
    J = 4
    flows = np.ones((J, 2), np.float32)
    flows[:, 1] = -1.0
    out = perturb_hypothesis(flows, 1.0, 1.0)
    scale = (0.9 / J) * np.arange(J) + 0.1
    np.testing.assert_allclose(out[:, 0], 1.0 + scale, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -1.0 - scale, atol=1e-6)


def test_forward_backward_consistency_accumulated():
    J, h, w = 4, 12, 12
    fwd = np.zeros((J, h, w, 2), np.float32)
    fwd[..., 0] = 1.0
    bwd = -fwd
    mask, diff = forward_backward_consistency(fwd, bwd, S=3, epsilon=1.0,
                                              jetwise=False)
    mask = np.asarray(mask)
    assert mask[2:-2, 2:-2].all()
    bwd2 = bwd + 8.0
    mask2, _ = forward_backward_consistency(fwd, bwd2, S=3, epsilon=1.0,
                                            jetwise=False)
    assert (np.asarray(mask2)[2:-2, 2:-2] == 0).any()
