"""solve_multilabel vs a sequential TRW-S oracle on bench-shaped energies.

The binary occlusion Potts solver has its exact mincut oracle
(test_potts_oracle.py); this gives the multi-label selection MRF
(dense_tracking.cpp:1816-1831, TRW-S v1.3) the same treatment: a
scanline-order sequential TRW-S (tests/trws_oracle.py) with a monotone
lower bound provides (a) a reference labeling energy and (b) the bound
trajectory, against which the synchronous solver's labeling quality and
its acc_trws_eps early-exit semantics are asserted.
"""
import numpy as np
import pytest

from trws_oracle import SequentialTRWS

jax = pytest.importorskip("jax")


def _bench_shaped_problem(h=20, w=28, K=8, seed=0):
    """Energies with the selection MRF's structure: per-pixel hypothesis
    banks with invalid slots (+BIG), trajectory-distance pairwise costs via
    the production pairwise_costs, and unary = trajectory energies."""
    import jax.numpy as jnp

    from slowflow_tpu.tracking.mrf import BIG, pairwise_costs

    rng = np.random.default_rng(seed)
    J = 5
    # two moving layers plus noise -> multimodal hypothesis banks
    base = np.where(rng.random((h, w, 1, 1, 1)) > 0.4,
                    np.array([1.5, -0.8]), np.array([-1.5, -0.8]))
    flows = (base + 0.3 * rng.standard_normal((h, w, K, J, 2))
             ).astype(np.float32) * (1 + np.arange(J)[:, None] * 0.1)
    occl = (rng.random((h, w, K, J + 1)) < 0.15).astype(np.int32)
    valid = rng.random((h, w, K)) < 0.8
    valid[..., 0] = True
    unary = (20.0 * rng.random((h, w, K)).astype(np.float32)
             + np.where(valid, 0.0, BIG)).astype(np.float32)
    sw = (0.2 + 0.6 * rng.random((h, w)).astype(np.float32))

    cost_r, cost_d = pairwise_costs(
        jnp.asarray(flows), jnp.asarray(occl), jnp.asarray(sw),
        beta=10.0, spatial_occ=10.0, method=1)
    return (np.asarray(unary), np.asarray(cost_r), np.asarray(cost_d))


@pytest.fixture(scope="module")
def problem():
    return _bench_shaped_problem()


@pytest.fixture(scope="module")
def oracle_run(problem):
    unary, cost_r, cost_d = problem
    orc = SequentialTRWS(unary, cost_r, cost_d)
    lab, energy, bounds = orc.run(iters=30)
    return orc, lab, energy, bounds


def test_oracle_bound_monotone_and_valid(oracle_run):
    """The oracle's lower bound must be non-decreasing (TRW-S's defining
    property) and never exceed its own labeling energy."""
    orc, lab, energy, bounds = oracle_run
    diffs = np.diff(bounds)
    assert (diffs >= -1e-6 * np.abs(bounds[:-1])).all(), diffs.min()
    assert bounds[-1] <= energy + 1e-6


def test_solver_energy_within_gap_of_oracle(problem, oracle_run):
    """The synchronous solver's labeling energy must sit in the band
    [oracle bound, oracle energy * (1 + gap)] — i.e. it neither beats the
    valid bound (impossible) nor falls measurably behind sequential TRW-S."""
    from slowflow_tpu.tracking.mrf import solve_multilabel

    unary, cost_r, cost_d = problem
    _, _, energy_orc, bounds = oracle_run

    labels, energy, _ = solve_multilabel(unary, cost_r, cost_d,
                                         iters=30, approach=0, eps=0.0)
    energy = float(energy)
    assert energy >= bounds[-1] - 1e-3
    gap = (energy - energy_orc) / abs(energy_orc)
    assert gap < 0.02, (energy, energy_orc, gap)


def test_eps_exit_not_premature(problem, oracle_run):
    """acc_trws_eps early exit must not stop while the oracle's bound is
    still climbing: the eps-exited labeling energy must match the
    full-iteration labeling energy within the same gap the oracle's bound
    plateau defines."""
    from slowflow_tpu.tracking.mrf import solve_multilabel

    unary, cost_r, cost_d = problem
    _, _, _, bounds = oracle_run
    # the iteration where the oracle's own bound has plateaued to 1e-5
    rel = np.abs(np.diff(bounds)) / max(1.0, abs(bounds[-1]))
    plateau_it = int(np.argmax(rel < 1e-7)) + 1

    _, e_full, _ = solve_multilabel(unary, cost_r, cost_d,
                                    iters=60, approach=0, eps=0.0)
    _, e_eps, _ = solve_multilabel(unary, cost_r, cost_d,
                                   iters=60, approach=0, eps=1e-5)
    # early exit may trade a *tiny* amount of energy for the saved
    # iterations, never a structural amount
    assert float(e_eps) <= float(e_full) * 1.005 + 1e-3, \
        (float(e_eps), float(e_full), plateau_it)


def test_bp_switch_runs(problem):
    """acc_approach=1 (Minimize_BP) produces a valid labeling too."""
    from slowflow_tpu.tracking.mrf import BIG, solve_multilabel

    unary, cost_r, cost_d = problem
    labels, energy, _ = solve_multilabel(unary, cost_r, cost_d,
                                         iters=15, approach=1)
    k = unary.shape[-1]
    assert labels.min() >= 0 and labels.max() < k
    picked = np.take_along_axis(unary, np.asarray(labels)[..., None],
                                -1)[..., 0]
    assert (picked < BIG).all()     # never selects an invalid slot
    assert float(energy) < BIG


def test_production_bound_monotone_and_valid(problem, oracle_run):
    """Round-4: solve_multilabel's lower_bound is now the chain-decomposition
    dual (not the old non-monotone reparametrized-unary proxy). It must be
    (a) a valid bound: <= its own labeling energy and <= the oracle's
    labeling energy, (b) non-decreasing in iteration count, and (c) land
    within 2% of the oracle's converged dual."""
    from slowflow_tpu.tracking.mrf import solve_multilabel

    unary, cost_r, cost_d = problem
    _, _, energy_orc, bounds_orc = oracle_run

    lbs = []
    for it in (1, 2, 4, 8, 16, 30):
        _, energy, lb = solve_multilabel(unary, cost_r, cost_d, iters=it,
                                         approach=0, eps=-1e30)
        lb = float(lb)
        assert lb <= float(energy) + 1e-3, (it, lb, float(energy))
        assert lb <= energy_orc + 1e-3, (it, lb, energy_orc)
        lbs.append(lb)
    lbs = np.asarray(lbs)
    diffs = np.diff(lbs)
    assert (diffs >= -1e-4 * np.abs(lbs[:-1])).all(), lbs
    rel = abs(lbs[-1] - bounds_orc[-1]) / abs(bounds_orc[-1])
    assert rel < 0.02, (lbs[-1], bounds_orc[-1], rel)


def test_eps_gates_on_monotone_dual(problem):
    """With the monotone dual driving the eps gate, a loose eps must stop
    earlier (same or cheaper result) and a tight eps must reproduce the
    full-iteration bound."""
    from slowflow_tpu.tracking.mrf import solve_multilabel

    unary, cost_r, cost_d = problem
    _, e_full, lb_full = solve_multilabel(unary, cost_r, cost_d, iters=40,
                                          approach=0, eps=-1e30)
    _, e_tight, lb_tight = solve_multilabel(unary, cost_r, cost_d, iters=40,
                                            approach=0, eps=1e-6)
    # the tight-eps exit happens at the dual plateau: bound within 0.1%
    assert abs(float(lb_tight) - float(lb_full)) \
        <= 1e-3 * abs(float(lb_full)) + 1e-3
    assert float(e_tight) <= float(e_full) * 1.005 + 1e-3
