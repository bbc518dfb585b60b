import numpy as np
import jax.numpy as jnp

from slowflow_tpu.tracking import (
    accumulate_consistent_batches, accumulate_flow, forward_backward_check,
    solve_multilabel,
)
from slowflow_tpu.tracking.hypothesis import (
    EnergyParams, adapt_fps, add_jc, add_oc, set_occlusions,
    trajectory_distance, ACC, ADJ, FINAL,
)
from slowflow_tpu.tracking.driver import TrackingConfig, track_final_pair
from slowflow_tpu.core.penalty import make_penalty


def const_flow(J, h, w, u, v):
    f = np.zeros((J, h, w, 2), np.float32)
    f[..., 0] = u
    f[..., 1] = v
    return f


def test_accumulate_consistent_constant_motion():
    J, h, w = 4, 12, 16
    fwd = const_flow(J, h, w, 1.0, 0.5)
    bwd = const_flow(J, h, w, -1.0, -0.5)
    acc, tracked = accumulate_consistent_batches(fwd, bwd, epsilon=1.0)
    acc = np.asarray(acc)
    tracked = np.asarray(tracked)
    # interior pixels stay tracked the whole way with accumulated flow (f+1)*v
    inner = (slice(2, -6), slice(2, -6))
    assert (tracked[inner] == J).all()
    for f in range(J):
        np.testing.assert_allclose(acc[f][inner][..., 0], f + 1.0, atol=1e-4)
        np.testing.assert_allclose(acc[f][inner][..., 1], (f + 1) * 0.5,
                                   atol=1e-4)


def test_accumulate_consistent_fallback():
    """Inconsistent backward flow triggers the constant-velocity fallback and
    reduces the tracked length."""
    J, h, w = 3, 10, 10
    fwd = const_flow(J, h, w, 1.0, 0.0)
    bwd = const_flow(J, h, w, -1.0, 0.0)
    bwd[1] += 10.0  # jet 1 inconsistent
    acc, tracked = accumulate_consistent_batches(fwd, bwd, epsilon=1.0)
    tracked = np.asarray(tracked)
    inner = (slice(1, -4), slice(1, -4))
    assert (tracked[inner] == 2).all()  # lost at f=1 -> tracked = f+1 = 2
    # constant-velocity still extends the flow
    acc = np.asarray(acc)
    np.testing.assert_allclose(acc[2][inner][..., 0], 3.0, atol=1e-4)


def test_accumulate_flow_occlusion():
    J, h, w = 3, 8, 8
    fwd = const_flow(J, h, w, 0.5, 0.0)
    occ = np.zeros((J, h, w), np.uint8)
    occ[0, :, 4:] = 1  # right half becomes occluded after jet 0
    acc = np.asarray(accumulate_flow(fwd, occ))
    assert (acc[0][:, :6, 0] == 0.5).all()
    assert (acc[1][:, 5:, 0] > 1e9).all()  # UNKNOWN after occlusion
    assert (acc[1][:, :2, 0] == 1.0).all()


def test_forward_backward_check():
    J, h, w = 2, 10, 10
    fwd = const_flow(J, h, w, 1.0, 0.0)
    bwd = const_flow(J, h, w, -1.0, 0.0)
    mask = forward_backward_check(fwd, bwd, epsilon=0.5, jetwise=True)
    assert mask[2:-2, 2:-2].sum() == 0
    bwd2 = bwd + 5.0
    mask2 = forward_backward_check(fwd, bwd2, epsilon=0.5, jetwise=True)
    assert (mask2[2:-2, 2:-2] == 1).all()


def test_adapt_fps():
    flows = np.zeros((2, 2, 4, 2), np.float32)
    flows[..., :, 0] = np.arange(1, 5)  # accumulated u: 1, 2, 3, 4
    down = adapt_fps(flows, 2)          # skip=2: take indices 1, 3
    np.testing.assert_allclose(down[..., :, 0],
                               np.broadcast_to([2.0, 4.0], (2, 2, 2)))
    same = adapt_fps(flows, 4)
    np.testing.assert_allclose(same, flows)


def test_set_occlusions_consistent_visible():
    J, h, w = 3, 16, 16
    fwd = const_flow(J, h, w, 1.0, 0.0)
    bwd = const_flow(J, h, w, -1.0, 0.0)
    flows = np.zeros((4, J, 2), np.float32)
    flows[:, :, 0] = np.arange(1, J + 1)  # matches the jet flow
    px = jnp.asarray(np.array([3.0, 5.0, 7.0, 9.0], np.float32))
    py = jnp.asarray(np.array([8.0, 8.0, 8.0, 8.0], np.float32))
    occ = np.asarray(set_occlusions(px, py, jnp.asarray(flows),
                                    jnp.asarray(fwd), jnp.asarray(bwd),
                                    5.0, 5.0))
    assert occ.shape == (4, J + 1)
    assert occ.sum() == 0  # fully visible

    # trajectory that contradicts the jet flow -> occluded
    bad = flows.copy()
    bad[:, :, 0] = -np.arange(1, J + 1) * 10
    occ_bad = np.asarray(set_occlusions(px, py, jnp.asarray(bad),
                                        jnp.asarray(fwd), jnp.asarray(bwd),
                                        5.0, 5.0))
    assert (occ_bad[:, 1:] == 1).all()


def test_add_jc_prefers_matching_trajectory():
    J, h, w = 3, 16, 16
    fwd = const_flow(J, h, w, 1.0, 0.0)
    pen = make_penalty(1, 0.001)
    p = EnergyParams(acc_jc=1.0, acc_cv=0.0)
    px = jnp.asarray(np.full((2,), 8.0, np.float32))
    py = jnp.asarray(np.full((2,), 8.0, np.float32))
    flows = np.zeros((2, J, 2), np.float32)
    flows[0, :, 0] = np.arange(1, J + 1)      # good
    flows[1, :, 0] = np.arange(1, J + 1) * 2  # wrong
    occl = np.zeros((2, J + 1), np.int32)
    e = np.asarray(add_jc(px, py, jnp.asarray(flows), jnp.asarray(occl),
                          jnp.asarray(fwd), pen, p))
    assert e[0] < e[1]


def test_add_oc():
    p = EnergyParams(acc_occ=10.0, acc_temporal_occ=1.0)
    occl = jnp.asarray(np.array([[0, 0, 0, 0], [0, 1, 1, 0]], np.int32))
    e = np.asarray(add_oc(occl, p))
    assert e[0] == 0.0
    assert e[1] == 10.0 * 2 + 1.0 * 2


def test_trajectory_distance_modes():
    a = np.zeros((3, 2), np.float32)
    b = np.zeros((3, 2), np.float32)
    a[:, 0] = [1, 2, 3]
    b[:, 0] = [1, 2, 5]
    da = np.asarray(trajectory_distance(jnp.asarray(a), jnp.asarray(b), ACC))
    df = np.asarray(trajectory_distance(jnp.asarray(a), jnp.asarray(b), FINAL))
    dj = np.asarray(trajectory_distance(jnp.asarray(a), jnp.asarray(b), ADJ))
    np.testing.assert_allclose(df, 2.0, atol=1e-6)
    np.testing.assert_allclose(da, 2.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(dj, 2.0 / 3.0, atol=1e-6)


def test_solve_multilabel_unary_dominant():
    rng = np.random.default_rng(0)
    h, w, K = 8, 8, 4
    unary = rng.random((h, w, K)).astype(np.float32)
    cost_r = np.zeros((h, w, K, K), np.float32)
    cost_d = np.zeros((h, w, K, K), np.float32)
    labels, energy, lb = solve_multilabel(jnp.asarray(unary),
                                          jnp.asarray(cost_r),
                                          jnp.asarray(cost_d), iters=5)
    np.testing.assert_array_equal(np.asarray(labels), unary.argmin(-1))


def test_solve_multilabel_smooths():
    """Potts pairwise flips an isolated disagreeing pixel."""
    h, w, K = 9, 9, 2
    unary = np.zeros((h, w, K), np.float32)
    unary[..., 1] = 0.2          # label 0 preferred everywhere...
    unary[4, 4, 0] = 0.5         # ...except the center prefers 1
    unary[4, 4, 1] = 0.0
    potts = 1.0 - np.eye(K, dtype=np.float32)
    cost_r = np.tile(potts, (h, w, 1, 1)).astype(np.float32)
    cost_d = cost_r.copy()
    for approach in (0, 1):
        labels, _, _ = solve_multilabel(
            jnp.asarray(unary), jnp.asarray(cost_r), jnp.asarray(cost_d),
            iters=20, approach=approach)
        assert np.asarray(labels).sum() == 0, approach


def test_track_final_pair_smoke():
    """Tiny end-to-end: constant motion scene, exact jet flows -> the tracker
    must return the accumulated flow."""
    rng = np.random.default_rng(0)
    J, h, w = 3, 24, 28
    u, v = 1.0, 0.5
    fwd = const_flow(J, h, w, u, v)
    bwd = const_flow(J, h, w, -u, -v)

    base = rng.random((h + 8, w + 8)).astype(np.float32) * 255
    data = []
    for f in range(J + 1):
        yy, xx = np.mgrid[0:h, 0:w]
        data.append(base[yy, xx])  # appearance detail not critical here
    data = np.stack(data)[..., None].repeat(3, -1)  # [J+1, H, W, 3]
    dx = np.zeros_like(data)
    dy = np.zeros_like(data)
    sw = np.full((h, w), 0.5, np.float32)

    cfg = TrackingConfig(
        jets=J, rates=1, skip_pixel=1, alternate=2, epic_interpolation=False,
        neigh_hyp=2, hyp_neigh_tryouts=4, trws_max_iter=5, capacity=8,
        acc_bc=0.0, acc_gc=0.0)
    flow, occ_map, info = track_final_pair(
        cfg, [(fwd, bwd, None)], fwd, bwd, None, data, dx, dy, sw,
        weight_jet=np.zeros(1, np.float32))
    hh, ww = flow.shape[:2]
    inner = (slice(2, hh - 4), slice(2, ww - 4))
    # final flow = J * (u, v) divided by xy_incr (= 2 with skip_pixel 1)
    np.testing.assert_allclose(flow[inner][..., 0], J * u / 2, atol=0.1)
    np.testing.assert_allclose(flow[inner][..., 1], J * v / 2, atol=0.1)
