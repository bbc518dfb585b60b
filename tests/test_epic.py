import numpy as np
import jax.numpy as jnp

from slowflow_tpu.epic import EpicParams, epic, distance_transform, dist_trf_nnfield
from slowflow_tpu.epic.distance import BIG, seed_graph
from slowflow_tpu.native import knn_graph_all
from dt_oracle import dt_sweeps_oracle


def test_distance_transform_uniform_cost():
    """With uniform cost the geodesic DT approximates scaled euclidean-ish
    distance; exact values must match the sequential sweep oracle."""
    h, w = 24, 30
    cost = np.full((h, w), 1.0, np.float32)
    seeds = np.array([[5, 6], [22, 18]], np.int32)  # (x, y)
    sd = np.full((h, w), BIG, np.float32)
    sl = np.full((h, w), -1, np.int32)
    for i, (x, y) in enumerate(seeds):
        sd[y, x] = cost[y, x]
        sl[y, x] = i

    dmap, labels = distance_transform(jnp.asarray(cost), jnp.asarray(sd),
                                      jnp.asarray(sl), max_iter=256)
    dmap = np.asarray(dmap); labels = np.asarray(labels)

    od = np.where(np.isfinite(sd), sd, np.inf).astype(np.float32)
    od[od >= BIG] = np.inf
    ol = sl.copy()
    od, ol = dt_sweeps_oracle(cost, od, ol, max_iter=100, min_change=1e-6)

    assert np.isfinite(dmap).all()
    np.testing.assert_allclose(dmap, od, atol=0.2, rtol=0.02)
    # label fields agree except possibly on equidistant boundary pixels
    agree = (labels == ol).mean()
    assert agree > 0.95, agree


def test_distance_transform_wall():
    """A high-cost wall must force label assignment around it."""
    h, w = 20, 20
    cost = np.full((h, w), 0.1, np.float32)
    cost[:, 10] = 100.0  # vertical wall
    sd = np.full((h, w), BIG, np.float32)
    sl = np.full((h, w), -1, np.int32)
    sd[10, 2] = cost[10, 2]; sl[10, 2] = 0
    sd[10, 17] = cost[10, 17]; sl[10, 17] = 1
    dmap, labels = distance_transform(jnp.asarray(cost), jnp.asarray(sd),
                                      jnp.asarray(sl), max_iter=256)
    labels = np.asarray(labels)
    assert (labels[:, :10] == 0).all()
    assert (labels[:, 11:] == 1).all()


def test_seed_graph_and_knn():
    labels = np.array([[0, 0, 1, 1],
                       [0, 0, 1, 1],
                       [2, 2, 3, 3],
                       [2, 2, 3, 3]], np.int32)
    dmap = np.ones((4, 4), np.float64)
    indptr, indices, data = seed_graph(labels, dmap, 4)
    # adjacency: 0-1, 0-2, 1-3, 2-3 (each with weight 2 = 1+1)
    assert len(indices) == 8
    best, dist = knn_graph_all(indptr, indices, data, 3)
    assert best.shape == (4, 3)
    assert best[0, 0] == 0 and dist[0, 0] == 0
    assert set(best[0, 1:]) <= {1, 2}
    np.testing.assert_allclose(dist[0, 1:], 2.0)


def test_knn_python_fallback_matches_native():
    rng = np.random.default_rng(0)
    ns = 12
    # random symmetric graph
    dense = rng.random((ns, ns)).astype(np.float32)
    dense = 0.5 * (dense + dense.T)
    mask = rng.random((ns, ns)) < 0.4
    mask = mask | mask.T
    np.fill_diagonal(mask, False)
    rows, cols = np.nonzero(mask)
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    vals = dense[rows, cols]
    indptr = np.zeros(ns + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    from slowflow_tpu.native import _knn_python, get_lib
    b1 = np.empty((ns, 5), np.int32); d1 = np.empty((ns, 5), np.float32)
    _knn_python(indptr, cols.astype(np.int32), vals, 5, b1, d1)
    if get_lib() is not None:
        b2, d2 = knn_graph_all(indptr, cols.astype(np.int32), vals, 5)
        np.testing.assert_allclose(d1, d2, rtol=1e-5)


def _affine_flow_case(h, w, A, t):
    """Seeds on a grid moved by an affine map; epic should reproduce it."""
    ys, xs = np.mgrid[2:h - 2:5, 2:w - 2:5]
    pts = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    tgt = pts @ np.asarray(A, np.float32).T + np.asarray(t, np.float32)
    matches = np.concatenate([pts, tgt], 1)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gt_u = (A[0][0] - 1) * xx + A[0][1] * yy + t[0]
    gt_v = A[1][0] * xx + (A[1][1] - 1) * yy + t[1]
    return matches, np.stack([gt_u, gt_v], -1)


def test_epic_la_reproduces_affine_flow():
    h, w = 40, 50
    matches, gt = _affine_flow_case(h, w, [[1.02, 0.01], [-0.01, 0.99]],
                                    [1.5, -0.8])
    imlab = np.zeros((3, h, w), np.float32)  # flat image -> no saliency filter
    edges = np.full((h, w), 0.01, np.float32)
    params = EpicParams(method="LA", saliency_th=0.0, pref_nn=0, nn=20,
                        coef_kernel=0.8)
    flow = epic(imlab, matches, edges, params)
    err = np.abs(flow - gt)
    assert err.mean() < 0.1, err.mean()


def test_epic_nw_constant_flow():
    h, w = 30, 30
    matches, gt = _affine_flow_case(h, w, [[1.0, 0.0], [0.0, 1.0]], [2.0, 1.0])
    imlab = np.zeros((3, h, w), np.float32)
    edges = np.full((h, w), 0.01, np.float32)
    params = EpicParams(method="NW", saliency_th=0.0, pref_nn=0, nn=10)
    flow = epic(imlab, matches, edges, params)
    np.testing.assert_allclose(flow[..., 0], 2.0, atol=0.05)
    np.testing.assert_allclose(flow[..., 1], 1.0, atol=0.05)


def test_epic_prefilter_removes_outliers():
    h, w = 30, 30
    matches, _ = _affine_flow_case(h, w, [[1.0, 0.0], [0.0, 1.0]], [2.0, 1.0])
    bad = matches.copy()[:3]
    bad[:, 2] += 20.0  # gross outliers
    allm = np.concatenate([matches, bad], 0)
    imlab = np.zeros((3, h, w), np.float32)
    edges = np.full((h, w), 0.01, np.float32)
    params = EpicParams(method="NW", saliency_th=0.0, pref_nn=10, pref_th=5.0,
                        nn=10)
    flow = epic(imlab, allm, edges, params)
    np.testing.assert_allclose(flow[..., 0], 2.0, atol=0.1)
