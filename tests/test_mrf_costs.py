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
