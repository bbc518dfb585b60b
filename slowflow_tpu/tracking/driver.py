"""Dense tracking driver — stage 3 of the pipeline (dense_tracking.cpp:415-1977).

Per final frame pair: load the jet estimations at one or more frame rates,
build trajectory hypotheses (consistent accumulations + EPIC-interpolated),
then alternate between neighbour-proposal propagation, non-maximum
suppression, and multi-label MRF selection (TRW/BP), writing the final
reference flow and occlusion map.

TPU redesign highlights:
  - hypothesis sets are fixed-capacity [H, W, K] tensors (masks, not vectors
    of heap objects); all unary energies evaluate in one dispatch
  - FLANN KD-tree proposal sampling becomes seeded stratified offset sampling
    over the consistent-pixel lattice (identical distribution intent,
    reproducible via the cfg `seed`)
  - sequential TRW-S becomes synchronous TRW message passing (tracking.mrf)
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..config import ParameterList
from ..core.penalty import make_penalty
from .accumulate import accumulate_consistent_batches
from .hypothesis import (
    EnergyParams, adapt_fps, hypothesis_energy, set_occlusions,
    trajectory_distance, UNKNOWN,
)
from .mrf import pairwise_costs, solve_multilabel, BIG


@dataclass
class TrackingConfig:
    """All acc_* knobs (defaults: dense_tracking.cpp:118-166 + cfg)."""

    jets: int
    rates: int
    skip_pixel: int = 1
    consistency_threshold: float = 1.0
    discard_inconsistent: bool = False
    use_jet_occlusions: bool = False
    epic_interpolation: bool = True
    epic_skip: int = 2
    acc_jc: float = 1.0
    acc_bc: float = 0.1
    acc_gc: float = 1.0
    acc_occ: float = 500.0
    acc_beta: float = 10.0
    acc_spatial_occ: float = 10.0
    acc_cv: float = 0.0
    acc_temporal_occ: float = 10.0
    occlusion_threshold: float = 5.0
    occlusion_fb_threshold: float = 5.0
    alternate: int = 5
    approach: int = 0               # 0: TRW, 1: BP
    trws_eps: float = 1e-5
    trws_max_iter: int = 10
    neigh_hyp: int = 5
    neigh_hyp_radius: float = 100.0
    hyp_neigh_tryouts: int = 20
    nn_skip1: int = 2
    nn_skip2: int = 4
    perturb_keep: int = 0
    traj_sim_method: int = 1        # 0 ADJ, 1 ACC, 2 FINAL
    traj_sim_thres: float = 0.1
    penalty_fct_data: int = 1
    penalty_fct_data_eps: float = 0.001
    penalty_fct_reg: int = 1
    penalty_fct_reg_eps: float = 0.001
    seed: int = 0
    capacity: int = 16

    @classmethod
    def from_parameter_list(cls, params: ParameterList, jets: int, rates: int):
        g = params.parameter
        return cls(
            jets=jets, rates=rates,
            skip_pixel=g("acc_skip_pixel", "0", int),
            consistency_threshold=g("acc_consistency_threshold", "1.0", float),
            discard_inconsistent=g("acc_discard_inconsistent", "0", bool),
            use_jet_occlusions=g("acc_occlusion", "0", bool)
            or g("acc_use_jet_occlusions", "0", bool),
            epic_interpolation=g("acc_epic_interpolation", "1", bool),
            epic_skip=int(g("acc_epic_skip", "2", float)),
            acc_jc=g("acc_jet_consistency", "1.0", float),
            acc_bc=g("acc_brightness_constancy", "0.1", float),
            acc_gc=g("acc_gradient_constancy", "1.0", float),
            acc_occ=g("acc_occlusion_penalty", "500.0", float),
            acc_beta=g("acc_beta", "10.0", float),
            acc_spatial_occ=g("acc_spatial_occ", "10.0", float),
            acc_cv=g("acc_cv", "0.0", float),
            acc_temporal_occ=g("acc_temporal_occ", "10.0", float),
            occlusion_threshold=g("acc_occlusion_threshold", "5.0", float),
            occlusion_fb_threshold=g("acc_occlusion_fb_threshold", "5.0", float),
            alternate=g("acc_alternate", "5", int),
            approach=g("acc_approach", "0", int),
            trws_eps=g("acc_trws_eps", "1e-5", float),
            trws_max_iter=g("acc_trws_max_iter", "10", int),
            neigh_hyp=g("acc_neigh_hyp", "5", int),
            neigh_hyp_radius=g("acc_neigh_hyp_radius", "100.0", float),
            hyp_neigh_tryouts=g("acc_hyp_neigh_tryouts", "20", int),
            nn_skip1=g("acc_neigh_skip1", "2", int),
            nn_skip2=g("acc_neigh_skip2", "4", int),
            perturb_keep=g("acc_perturb_keep", "0", int),
            traj_sim_method=g("acc_traj_sim_method", "1", int),
            traj_sim_thres=g("acc_traj_sim_thres", "0.1", float),
            penalty_fct_data=g("acc_penalty_fct_data", "1", int),
            penalty_fct_data_eps=g("acc_penalty_fct_data_eps", "0.001", float),
            penalty_fct_reg=g("acc_penalty_fct_reg", "1", int),
            penalty_fct_reg_eps=g("acc_penalty_fct_reg_eps", "0.001", float),
            seed=g("seed", "0", int),
            capacity=g("acc_capacity", "16", int),
        )

    def energy_params(self) -> EnergyParams:
        return EnergyParams(
            acc_jc=self.acc_jc, acc_bc=self.acc_bc, acc_gc=self.acc_gc,
            acc_occ=self.acc_occ, acc_cv=self.acc_cv,
            acc_temporal_occ=self.acc_temporal_occ,
            skip_pixel=self.skip_pixel)


def jnp_occ(occlusions):
    """Jet occlusion maps -> jnp array or None (acc_occlusion gate)."""
    import jax.numpy as jnp

    if occlusions is None:
        return None
    return jnp.asarray(occlusions)


class HypothesisBank:
    """Fixed-capacity per-pixel hypothesis store with energy bookkeeping."""

    def __init__(self, h, w, K, J):
        self.h, self.w, self.K, self.J = h, w, K, J
        self.flows = np.full((h, w, K, J, 2), UNKNOWN, np.float32)
        self.occl = np.zeros((h, w, K, J + 1), np.int32)
        self.energy = np.full((h, w, K), np.inf, np.float32)
        self.valid = np.zeros((h, w, K), bool)
        self.jet_est = np.zeros((h, w, K), np.int32)

    def insert(self, flows, occl, energy, jet_est, mask):
        """Insert one hypothesis per pixel into the first free slot.
        flows [h, w, J, 2]; mask [h, w] selects pixels to insert at."""
        free = ~self.valid                            # [h, w, K]
        first_free = np.argmax(free, axis=-1)         # [h, w]
        has_free = free.any(-1)
        m = mask & has_free
        ys, xs = np.nonzero(m)
        ks = first_free[ys, xs]
        self.flows[ys, xs, ks] = flows[ys, xs]
        self.occl[ys, xs, ks] = occl[ys, xs]
        self.energy[ys, xs, ks] = energy[ys, xs]
        self.jet_est[ys, xs, ks] = jet_est if np.isscalar(jet_est) \
            else jet_est[ys, xs]
        self.valid[ys, xs, ks] = True
        return int(m.sum())

    def sort_by_energy(self, keep_first: np.ndarray | None = None):
        """Ascending-energy sort per pixel. If keep_first is given ([h, w]
        slot indices), that slot is moved to position 0 first
        (dense_tracking.cpp:1384-1428)."""
        e = np.where(self.valid, self.energy, np.inf).copy()
        if keep_first is not None:
            ys, xs = np.mgrid[0:self.h, 0:self.w]
            sel = np.clip(keep_first, 0, self.K - 1)
            e[ys, xs, sel] = -np.inf
        order = np.argsort(e, axis=-1, kind="stable")
        self._permute(order)

    def _permute(self, order):
        ys, xs = np.mgrid[0:self.h, 0:self.w]
        ys = ys[..., None]
        xs = xs[..., None]
        self.flows = self.flows[ys, xs, order]
        self.occl = self.occl[ys, xs, order]
        self.energy = self.energy[ys, xs, order]
        self.valid = self.valid[ys, xs, order]
        self.jet_est = self.jet_est[ys, xs, order]

    def truncate(self, n: int):
        """Invalidate slots >= n."""
        self.valid[..., n:] = False
        self.energy[..., n:] = np.inf

    def nms(self, method: int, thres: float):
        """Greedy per-pixel non-maximum suppression by trajectory distance
        (dense_tracking.cpp:1585-1637). Assumes slots sorted by priority."""
        import jax.numpy as jnp

        d = np.asarray(trajectory_distance(
            jnp.asarray(self.flows)[:, :, :, None],
            jnp.asarray(self.flows)[:, :, None, :], method))  # [h, w, K, K]
        kept = np.zeros((self.h, self.w, self.K), bool)
        kept[..., 0] = self.valid[..., 0]
        for k in range(1, self.K):
            close = (d[..., k, :k] < thres) & kept[..., :k]
            kept[..., k] = self.valid[..., k] & ~close.any(-1)
        self.valid &= kept
        self.energy[~self.valid] = np.inf


def build_initial_hypotheses(bank, cfg: TrackingConfig, rate_flows,
                             forward, backward, occlusions,
                             data, data_dx, data_dy, weight_jet, epic_ctx,
                             timing=None):
    occ_masks = jnp_occ(occlusions)
    """Hypothesis generation from each jet estimation
    (dense_tracking.cpp:1098-1360). Returns consistent mask [h, w].
    `timing` (optional dict) accumulates "warp" (accumulation) and "data"
    (energy evaluation) seconds, mirroring dt_warp_time/dt_sum_time
    (dense_tracking.cpp:305,336)."""
    import time as _time

    import jax.numpy as jnp

    timing = timing if timing is not None else {}
    timing.setdefault("warp", 0.0)
    timing.setdefault("data", 0.0)

    pen_d = make_penalty(cfg.penalty_fct_data, cfg.penalty_fct_data_eps)
    ep = cfg.energy_params()
    xy_incr = cfg.skip_pixel + 1
    xy_start = int(0.5 * cfg.skip_pixel)
    h, w = bank.h, bank.w
    yy, xx = np.mgrid[0:h, 0:w]
    px = (xx * xy_incr + xy_start).astype(np.float32)
    py = (yy * xy_incr + xy_start).astype(np.float32)

    consistent = np.zeros((h, w), bool)

    for r, (r_fwd, r_bwd, r_occ) in enumerate(rate_flows):
        r_jets = r_fwd.shape[0]
        t0 = _time.time()
        acc, tracked = accumulate_consistent_batches(
            r_fwd, r_bwd, r_occ, cfg.consistency_threshold, cfg.skip_pixel,
            cfg.discard_inconsistent)
        acc = np.asarray(acc)          # [r_jets, h, w, 2]
        tracked = np.asarray(tracked)
        timing["warp"] += _time.time() - t0

        fully = tracked == r_jets
        consistent |= fully

        flows_r = np.moveaxis(acc, 0, 2)            # [h, w, r_jets, 2]
        flows = adapt_fps(flows_r, cfg.jets)        # [h, w, J, 2]

        t0 = _time.time()
        occl = np.asarray(set_occlusions(
            jnp.asarray(px)[..., None], jnp.asarray(py)[..., None],
            jnp.asarray(flows)[:, :, None], jnp.asarray(forward),
            jnp.asarray(backward), cfg.occlusion_threshold,
            cfg.occlusion_fb_threshold))[:, :, 0]

        energy = np.asarray(hypothesis_energy(
            jnp.asarray(px)[..., None], jnp.asarray(py)[..., None],
            jnp.asarray(flows)[:, :, None], jnp.asarray(occl)[:, :, None],
            jnp.asarray(forward), jnp.asarray(data), jnp.asarray(data_dx),
            jnp.asarray(data_dy), pen_d, ep,
            occ_masks))[:, :, 0] + weight_jet[r]
        timing["data"] += _time.time() - t0

        bank.insert(flows, occl, energy, r, fully)

        # EPIC-interpolated hypotheses from the consistent matches; isolated
        # consistent speckles are removed first (dense_tracking.cpp:1265)
        if cfg.epic_interpolation and epic_ctx is not None:
            from ..utils.segments import remove_small_segments

            r_cons = fully.astype(np.int32)
            remove_small_segments(r_cons, 0.1, 100)
            epic_flows = _epic_hypotheses(acc, r_cons > 0, cfg, epic_ctx)
            if epic_flows is not None:
                eflows = adapt_fps(epic_flows, cfg.jets)
                eoccl = np.asarray(set_occlusions(
                    jnp.asarray(px)[..., None], jnp.asarray(py)[..., None],
                    jnp.asarray(eflows)[:, :, None], jnp.asarray(forward),
                    jnp.asarray(backward), cfg.occlusion_threshold,
                    cfg.occlusion_fb_threshold))[:, :, 0]
                eenergy = np.asarray(hypothesis_energy(
                    jnp.asarray(px)[..., None], jnp.asarray(py)[..., None],
                    jnp.asarray(eflows)[:, :, None],
                    jnp.asarray(eoccl)[:, :, None],
                    jnp.asarray(forward), jnp.asarray(data),
                    jnp.asarray(data_dx), jnp.asarray(data_dy),
                    pen_d, ep, occ_masks))[:, :, 0] + weight_jet[r]
                bank.insert(eflows, eoccl, eenergy, r,
                            np.ones((h, w), bool))
    return consistent


def _epic_hypotheses(acc, consistent, cfg: TrackingConfig, epic_ctx):
    """EPIC interpolation of each jet's consistent accumulated flow
    (dense_tracking.cpp:1268-1350). Returns [h, w, r_jets, 2] or None."""
    from ..epic import epic

    imlab, edges, epic_params = epic_ctx
    r_jets, h, w = acc.shape[:3]
    xy_incr = cfg.skip_pixel + 1
    skip = cfg.epic_skip
    ys, xs = np.mgrid[int(0.5 * skip):h:skip, int(0.5 * skip):w:skip]
    sel = consistent[ys, xs]
    if sel.sum() < 8:
        return None
    sx = xs[sel]
    sy = ys[sel]

    out = np.zeros((h, w, r_jets, 2), np.float32)
    for j in range(r_jets):
        m = np.stack([
            sx, sy,
            sx + acc[j][sy, sx, 0] / xy_incr,
            sy + acc[j][sy, sx, 1] / xy_incr,
        ], 1).astype(np.float32)
        flow = epic(imlab, m, edges, epic_params)
        out[:, :, j, 0] = flow[:h, :w, 0] * xy_incr
        out[:, :, j, 1] = flow[:h, :w, 1] * xy_incr
    return out


def _group_evaluator(pen_fct, pen_eps, occ_thr, fb_thr, sim_method, ep,
                     has_occ_masks, _cache={}):
    """Jitted proposal-group evaluation: occlusions + energy + both distance
    tables fuse into ONE program (each separate call pays a ~30 ms round
    trip on tunneled backends). Cached at module level so repeated
    propagate_neighbors calls reuse the traced function."""
    import jax

    key = (pen_fct, pen_eps, occ_thr, fb_thr, sim_method, ep, has_occ_masks)
    if key in _cache:
        return _cache[key]
    pen_d = make_penalty(pen_fct, pen_eps)

    @jax.jit
    def eval_group(px1, py1, cand_flows, bank_flows, forward, backward,
                   data, data_dx, data_dy, *extra):
        occ_masks = extra[0] if has_occ_masks else None
        occl = set_occlusions(px1, py1, cand_flows, forward, backward,
                              occ_thr, fb_thr)
        energy = hypothesis_energy(px1, py1, cand_flows, occl, forward,
                                   data, data_dx, data_dy, pen_d, ep,
                                   occ_masks)
        d_bank = trajectory_distance(cand_flows[:, :, :, None],
                                     bank_flows[:, :, None], sim_method)
        d_cand = trajectory_distance(cand_flows[:, :, :, None],
                                     cand_flows[:, :, None], sim_method)
        return occl, energy, d_bank, d_cand

    _cache[key] = eval_group
    return eval_group


def propagate_neighbors(bank: HypothesisBank, cfg: TrackingConfig, consistent,
                        forward, backward, data, data_dx, data_dy,
                        weight_jet, p_it: int, occlusions=None):

    """Neighbour-proposal sampling (dense_tracking.cpp:1434-1583).

    Seeded stratified replacement for the FLANN KD-tree search: for each of
    the two lattice strides, draw `tryouts` random offsets within the radius,
    keep draws landing on valid source pixels, and adopt the source's best
    hypothesis re-anchored at the target.
    """
    import jax.numpy as jnp

    pen_d = make_penalty(cfg.penalty_fct_data, cfg.penalty_fct_data_eps)
    ep = cfg.energy_params()
    h, w = bank.h, bank.w
    xy_incr = cfg.skip_pixel + 1
    xy_start = int(0.5 * cfg.skip_pixel)
    yy, xx = np.mgrid[0:h, 0:w]
    px = (xx * xy_incr + xy_start).astype(np.float32)
    py = (yy * xy_incr + xy_start).astype(np.float32)
    rng = np.random.default_rng(cfg.seed + p_it)
    occ_masks = jnp_occ(occlusions)

    ntry = cfg.hyp_neigh_tryouts
    # candidates per device dispatch. NOTE: the group size is semantics-
    # relevant — within a group, an insertion that evicts an existing bank
    # hypothesis leaves later candidates' d_bank rows stale (the reference's
    # strictly sequential tryout loop refreshes per tryout); 4 keeps that
    # window small
    group = max(1, min(4, ntry))

    forward_j = jnp.asarray(forward)
    backward_j = jnp.asarray(backward)
    data_j = jnp.asarray(data)
    data_dx_j = jnp.asarray(data_dx)
    data_dy_j = jnp.asarray(data_dy)
    evaluator = _group_evaluator(
        cfg.penalty_fct_data, cfg.penalty_fct_data_eps,
        cfg.occlusion_threshold, cfg.occlusion_fb_threshold,
        cfg.traj_sim_method, ep, occ_masks is not None)

    def eval_group(px1, py1, cand_flows, bank_flows):
        extra = (occ_masks,) if occ_masks is not None else ()
        return evaluator(px1, py1, cand_flows, bank_flows, forward_j,
                         backward_j, data_j, data_dx_j, data_dy_j, *extra)

    for t, stride in enumerate((cfg.nn_skip1, cfg.nn_skip2)):
        radius = (t + 1) * cfg.neigh_hyp_radius / xy_incr
        want = (t + 1) * cfg.neigh_hyp
        added = np.zeros((h, w), np.int32)

        # draw all tryouts up front (same seeded distribution as the
        # per-tryout loop) and evaluate them in grouped dispatches
        ang = rng.uniform(0, 2 * np.pi, (ntry, h, w))
        rad = np.sqrt(rng.uniform(0, 1, (ntry, h, w))) * radius
        sx_all = np.clip((xx + rad * np.cos(ang)).astype(int), 0, w - 1)
        sy_all = np.clip((yy + rad * np.sin(ang)).astype(int), 0, h - 1)
        sx_all = np.clip(((sx_all - 1) // stride) * stride + 1, 0, w - 1)
        sy_all = np.clip(((sy_all - 1) // stride) * stride + 1, 0, h - 1)

        for g0 in range(0, ntry, group):
            sxg = sx_all[g0:g0 + group]                       # [G, h, w]
            syg = sy_all[g0:g0 + group]
            G = sxg.shape[0]
            cand_flows = np.stack([bank.flows[syg[i], sxg[i], 0]
                                   for i in range(G)], axis=2)  # [h, w, G, J, 2]
            cand_jet = np.stack([bank.jet_est[syg[i], sxg[i], 0]
                                 for i in range(G)], axis=2)    # [h, w, G]

            occl_d, energy_d, d_bank_d, d_cand_d = eval_group(
                jnp.asarray(px)[..., None], jnp.asarray(py)[..., None],
                jnp.asarray(cand_flows), jnp.asarray(bank.flows))
            occl = np.asarray(occl_d)                           # [h, w, G, J+1]
            energy = np.asarray(energy_d) + weight_jet[cand_jet]  # [h, w, G]
            d_bank = np.asarray(d_bank_d)                       # [h, w, G, K]
            d_cand = np.asarray(d_cand_d)                       # [h, w, G, G]

            # sequential insertion semantics on the host (cheap bit-ops)
            inserted_prev = {}
            for i in range(G):
                src_ok = bank.valid[syg[i], sxg[i], 0]
                if p_it == 0:
                    src_ok &= consistent[syg[i], sxg[i]]
                src_ok &= (sxg[i] != xx) | (syg[i] != yy)
                src_ok &= added < want
                similar = ((d_bank[:, :, i] < cfg.traj_sim_thres)
                           & bank.valid).any(-1)
                for j in range(i):
                    similar |= inserted_prev[j] & (
                        d_cand[:, :, i, j] < cfg.traj_sim_thres)
                ins = src_ok & ~similar
                bank.insert(cand_flows[:, :, i], occl[:, :, i],
                            energy[:, :, i], cand_jet[:, :, i], ins)
                inserted_prev[i] = ins
                added += ins.astype(np.int32)
            if (added >= want).all():
                break


def track_final_pair(cfg: TrackingConfig, rate_flows, forward, backward,
                     occlusions, data, data_dx, data_dy, smooth_weight,
                     weight_jet=None, epic_ctx=None, verbose=False):
    """Full alternating optimization for one final frame pair.

    rate_flows: list of (forward [Jr, H, W, 2], backward, occl-or-None) per
    frame rate (index 0 = the reference/min-fps rate).
    forward/backward: the min-fps jet flows [J, H, W, 2].
    data*: [J+1, H, W, 3] normalized images and derivatives.
    smooth_weight: [H, W].
    Returns (flow [h, w, 2], occlusion_map [h, w] uint8, info dict).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    if weight_jet is None:
        weight_jet = np.arange(cfg.rates, dtype=np.float32)
    J = cfg.jets
    xy_incr = cfg.skip_pixel + 1
    xy_start = int(0.5 * cfg.skip_pixel)
    oh, ow = data.shape[1:3]
    h = int(np.floor(oh / xy_incr))
    w = int(np.floor(ow / xy_incr))

    # per-phase accumulators matching the reference's result.info rows
    # (dense_tracking.cpp:1951-1964); "median" exists in the reference but
    # is never incremented there either (dt_med_time, :235,1371)
    timing = {"warp": 0.0, "median": 0.0, "data": 0.0,
              "unary": 0.0, "pairwise": 0.0, "optimization": 0.0}

    bank = HypothesisBank(h, w, cfg.capacity, J)
    consistent = build_initial_hypotheses(
        bank, cfg, rate_flows, forward, backward, occlusions,
        data, data_dx, data_dy, weight_jet, epic_ctx, timing)

    # guarantee at least one hypothesis everywhere: zero-flow outlier
    none_valid = ~bank.valid.any(-1)
    if none_valid.any():
        zero_flow = np.zeros((h, w, J, 2), np.float32)
        occl = np.ones((h, w, J + 1), np.int32)
        occl[..., 0] = 0
        energy = np.full((h, w), 1e6, np.float32)
        bank.insert(zero_flow, occl, energy, 0, none_valid)

    selected = None
    info = {"variables": [], "factors": [], "timing": timing}
    for p_it in range(cfg.alternate):
        if p_it == 0:
            bank.sort_by_energy()
        else:
            bank.sort_by_energy(keep_first=selected)
            bank.truncate(1 + cfg.perturb_keep)

        propagate_neighbors(bank, cfg, consistent, forward, backward,
                            data, data_dx, data_dy, weight_jet, p_it,
                            occlusions)
        bank.nms(cfg.traj_sim_method, cfg.traj_sim_thres)

        t0 = _time.time()
        unary = jnp.asarray(
            np.where(bank.valid, bank.energy, BIG).astype(np.float32))
        jax.block_until_ready(unary)
        timing["unary"] += _time.time() - t0

        t0 = _time.time()
        safe_flows = np.where(bank.valid[..., None, None], bank.flows, 0.0)
        cost_r, cost_d = pairwise_costs(
            safe_flows, bank.occl, smooth_weight, cfg.acc_beta,
            cfg.acc_spatial_occ, cfg.traj_sim_method, xy_incr, xy_start)
        jax.block_until_ready((cost_r, cost_d))
        timing["pairwise"] += _time.time() - t0

        t0 = _time.time()
        labels, energy, lb = solve_multilabel(
            unary, cost_r, cost_d, iters=cfg.trws_max_iter,
            approach=cfg.approach, eps=cfg.trws_eps)
        selected = np.asarray(labels)
        timing["optimization"] += _time.time() - t0
        info["variables"].append(h * w)
        info["factors"].append(int(2 * h * w - h - w + h * w))
        if verbose:
            print(f"  alternate {p_it}: energy={float(energy):.1f} "
                  f"lower_bound={float(lb):.1f} hyps={bank.count()}")

    ys, xs = np.mgrid[0:h, 0:w]
    final_flow = bank.flows[ys, xs, selected, J - 1] / xy_incr
    occ_map = bank.occl[ys, xs, selected].max(-1).astype(np.uint8) * 255
    return final_flow.astype(np.float32), occ_map, info
