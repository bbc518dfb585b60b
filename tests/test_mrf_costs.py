import numpy as np
import jax.numpy as jnp

from slowflow_tpu.tracking.mrf import pairwise_costs, solve_multilabel


def test_pairwise_costs_structure():
    """Edge costs combine smoothness weight, trajectory distance (ACC) and
    occlusion disagreement (dense_tracking.cpp:1750-1766)."""
    h, w, K, J = 4, 5, 2, 3
    flows = np.zeros((h, w, K, J, 2), np.float32)
    flows[..., 1, :, 0] = 2.0          # slot 1 differs by 2px per jet
    occl = np.zeros((h, w, K, J + 1), np.int32)
    occl[..., 1, 0] = 1                # slot 1 occluded in frame 0
    sw = np.full((h, w), 0.5, np.float32)

    cost_r, cost_d = pairwise_costs(flows, occl, sw, beta=1.0,
                                    spatial_occ=10.0, method=1)
    cost_r = np.asarray(cost_r)
    # same slot at both pixels: zero distance, zero occ disagreement
    assert cost_r[0, 0, 0, 0] == 0.0
    # slot 0 vs slot 1: ACC distance = mean over f of 2/l -> 2*(1+1/2+1/3)/3
    d_acc = 2.0 * (1 + 0.5 + 1 / 3)
    expected = (0.5 + 0.5) * (1.0 * d_acc + 10.0 * 1)
    np.testing.assert_allclose(cost_r[0, 0, 0, 1], expected, rtol=1e-5)
    # symmetry of the construction: cost(1, 0) == cost(0, 1) here
    np.testing.assert_allclose(cost_r[0, 0, 1, 0], expected, rtol=1e-5)


def test_trw_lower_bound_bounded_by_energy():
    rng = np.random.default_rng(1)
    h, w, K = 6, 6, 3
    unary = rng.random((h, w, K)).astype(np.float32)
    potts = (1.0 - np.eye(K, dtype=np.float32)) * 0.2
    cost = np.tile(potts, (h, w, 1, 1)).astype(np.float32)
    labels, energy, lb = solve_multilabel(
        jnp.asarray(unary), jnp.asarray(cost), jnp.asarray(cost.copy()),
        iters=15, approach=0)
    assert float(lb) <= float(energy) + 1e-3


def test_epicflow_cli_nw(tmp_path, rng):
    """NW interpolation switch of the standalone CLI (epicflow.cpp -nw)."""
    from slowflow_tpu.cli.epicflow import main
    from slowflow_tpu.io import read_flo
    from slowflow_tpu.io.images import write_image

    h, w = 40, 48
    base = rng.random((h + 10, w + 10, 3)) * 255
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax, base)
    im1 = base[4:4 + h, 4:4 + w]
    im2 = base[4:4 + h, 3:3 + w]
    p1 = tmp_path / "a.png"; p2 = tmp_path / "b.png"
    write_image(p1, im1)
    write_image(p2, im2)
    out = tmp_path / "out.flo"
    rc = main([str(p1), str(p2), "auto", "auto", str(out), "-sintel", "-nw"])
    assert rc == 0
    flow = read_flo(out)
    inner = (slice(10, -10), slice(10, -10))
    err = np.hypot(flow[inner][..., 0] - 1.0, flow[inner][..., 1])
    assert err.mean() < 0.4, err.mean()


def test_trws_eps_early_exit(rng):
    """acc_trws_eps semantics (dense_tracking.cpp:660,1816-1831): TRW stops
    once the per-iteration lower-bound change drops below eps; a huge eps
    stops after one iteration, a tiny eps runs to max_iter."""
    import jax.numpy as jnp
    from slowflow_tpu.tracking.mrf import solve_multilabel

    h, w, K = 10, 12, 4
    unary = rng.random((h, w, K)).astype(np.float32) * 5
    potts = (1.0 - np.eye(K)).astype(np.float32) * 0.7
    cost = np.tile(potts, (h, w, 1, 1)).astype(np.float32)

    one_iter = solve_multilabel(jnp.asarray(unary), jnp.asarray(cost),
                                jnp.asarray(cost.copy()), iters=1, approach=0,
                                eps=0.0)
    big_eps = solve_multilabel(jnp.asarray(unary), jnp.asarray(cost),
                               jnp.asarray(cost.copy()), iters=30, approach=0,
                               eps=1e9)
    np.testing.assert_array_equal(np.asarray(one_iter[0]),
                                  np.asarray(big_eps[0]))

    full = solve_multilabel(jnp.asarray(unary), jnp.asarray(cost),
                            jnp.asarray(cost.copy()), iters=30, approach=0,
                            eps=0.0)
    conv = solve_multilabel(jnp.asarray(unary), jnp.asarray(cost),
                            jnp.asarray(cost.copy()), iters=30, approach=0,
                            eps=1e-7)
    # at convergence the eps-stopped run matches the full run's labeling
    assert (np.asarray(full[0]) == np.asarray(conv[0])).mean() > 0.99


def test_result_info_phase_breakdown(rng):
    """track_final_pair reports the reference's per-phase timers and
    per-alternation variable/factor streams (dense_tracking.cpp:1951-1964)."""
    from slowflow_tpu.tracking.driver import TrackingConfig, track_final_pair

    h, w, J = 16, 20, 2
    cfg = TrackingConfig(jets=J, rates=1, alternate=2, capacity=4,
                         neigh_hyp=1, hyp_neigh_tryouts=2, trws_max_iter=3)
    fwd = rng.random((J, h, w, 2)).astype(np.float32) * 0.5
    bwd = -fwd
    data = rng.random((J + 1, h, w, 3)).astype(np.float32)
    dx = np.zeros_like(data); dy = np.zeros_like(data)
    sw = np.ones((h, w), np.float32)
    flow, occ, info = track_final_pair(
        cfg, [(fwd, bwd, None)], fwd, bwd, None, data, dx, dy, sw)
    t = info["timing"]
    for key in ("warp", "median", "data", "unary", "pairwise", "optimization"):
        assert key in t
    assert t["median"] == 0.0          # never incremented in the reference
    assert t["warp"] > 0 and t["optimization"] > 0
    # grid is subsampled by skip_pixel+1 (default 2): 8x10 variables
    hh, ww = h // 2, w // 2
    assert info["variables"] == [hh * ww] * cfg.alternate
    assert len(info["factors"]) == cfg.alternate
