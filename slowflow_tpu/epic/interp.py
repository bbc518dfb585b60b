"""Edge-preserving interpolation of correspondences (EpicFlow, L4).

Re-implementation of epic_flow_extended/epic.cpp + the fitting kernels of
epic_aux.cpp. Pipeline (epic.cpp:147-234):
  1. rectify matches into the image area
  2. add constant `euc` to the edge cost map
  3. saliency filter (min-eigenvalue structure tensor threshold)
  4. consistency prefilter: Nadaraya-Watson estimate over pref_nn geodesic
     neighbours, drop matches deviating more than pref_th
  5. geodesic k-NN of every seed (TPU distance transform + host Dijkstra)
  6. fit Nadaraya-Watson or locally-weighted affine models per seed
     (batched lstsq replacing LAPACK sgels_, epic_aux.cpp:430-472)
  7. apply to all pixels via the closest-seed label map
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.image import saliency as saliency_fn
from .distance import dist_trf_nnfield


@dataclass
class EpicParams:
    """epic_params_t defaults (epic.cpp:127-136)."""

    method: str = "LA"          # "LA" or "NW"
    saliency_th: float = 0.045
    pref_nn: int = 25
    pref_th: float = 5.0
    nn: int = 100
    coef_kernel: float = 0.8
    euc: float = 0.001
    verbose: int = 0

    @classmethod
    def sintel(cls):
        """Preset used throughout the pipeline (slow_flow.cpp:268-272)."""
        return cls(pref_nn=25, nn=160, coef_kernel=1.1)


def fit_nadarayawatson(nnf, dis, vects):
    """Weighted-mean flow per seed (epic_aux.cpp:386-403).
    nnf [ns, k] indices (-1 = invalid), dis [ns, k] kernelized weights."""
    valid = nnf >= 0
    idx = np.where(valid, nnf, 0)
    w = np.where(valid, dis, 0.0)
    v = vects[idx]                       # [ns, k, 2]
    s = w.sum(1, keepdims=True)
    s = np.where(s == 0, 1.0, s)
    return (w[..., None] * v).sum(1) / s


def fit_localaffine(nnf, dis, seeds, vects):
    """Locally-weighted affine model per seed (epic_aux.cpp:430-472).

    For each seed i, solve the weighted least-squares system mapping neighbour
    seed positions to their targets; 4 low-weight stabilizer points around the
    seed guarantee non-degeneracy. Unknowns [a00, a01, tx, a10, a11, ty].
    Returns [ns, 6].
    """
    ns, k = nnf.shape
    valid = nnf >= 0
    idx = np.where(valid, nnf, 0)
    coef = np.where(valid, dis, 0.0).astype(np.float64)      # [ns, k]

    sx = seeds[:, 0].astype(np.float64)
    sy = seeds[:, 1].astype(np.float64)
    px = sx[idx]                                             # [ns, k]
    py = sy[idx]
    u = vects[idx][..., 0].astype(np.float64)
    v = vects[idx][..., 1].astype(np.float64)

    # self-neighbour reweighting (epic_aux.cpp:442)
    is_self = idx == np.arange(ns)[:, None]
    coefi = np.where(is_self, 0.01 * coef, 0.0).sum(1)       # [ns]
    coef = np.where(is_self, coef * 0.96, coef)

    # stabilizer points
    xi = sx[:, None] + np.array([0.1, 0.0, -0.1, 0.0])
    yi = sy[:, None] + np.array([0.0, 0.1, 0.0, -0.1])
    ui = np.repeat(vects[:, 0:1].astype(np.float64), 4, axis=1)
    vi = np.repeat(vects[:, 1:2].astype(np.float64), 4, axis=1)
    ci = np.repeat(coefi[:, None], 4, axis=1)

    X = np.concatenate([px, xi], 1)                          # [ns, k+4]
    Y = np.concatenate([py, yi], 1)
    U = np.concatenate([u, ui], 1)
    V = np.concatenate([v, vi], 1)
    C = np.concatenate([coef, ci], 1)

    # rows: [X*C, Y*C, C] -> (X + U)*C for x; same matrix for y with (Y + V)*C
    A = np.stack([X * C, Y * C, C], axis=-1)                 # [ns, m, 3]
    bx = (X + U) * C
    by = (Y + V) * C

    AtA = np.einsum("nmi,nmj->nij", A, A)
    AtA = AtA + 1e-9 * np.eye(3)
    Atbx = np.einsum("nmi,nm->ni", A, bx)
    Atby = np.einsum("nmi,nm->ni", A, by)
    try:
        solx = np.linalg.solve(AtA, Atbx[..., None])[..., 0]
        soly = np.linalg.solve(AtA, Atby[..., None])[..., 0]
    except np.linalg.LinAlgError:
        solx = np.stack([np.linalg.lstsq(a, b, rcond=None)[0]
                         for a, b in zip(AtA, Atbx)])
        soly = np.stack([np.linalg.lstsq(a, b, rcond=None)[0]
                         for a, b in zip(AtA, Atby)])
    # [a00, a01, tx, a10, a11, ty]
    return np.concatenate([solx, soly], axis=1).astype(np.float32)


def apply_nadarayawatson(seed_vects, labels):
    """Per-pixel flow = flow of closest seed (epic_aux.cpp:410-419)."""
    lab = np.clip(labels, 0, None)
    out = seed_vects[lab]
    out[labels < 0] = 0.0
    return out


def apply_localaffine(affine, labels, h, w):
    """Per-pixel flow from the closest seed's affine model
    (epic_aux.cpp:479-492): u = a00*x + a01*y + tx - x."""
    lab = np.clip(labels, 0, None)
    m = affine[lab]                                          # [H, W, 6]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = m[..., 0] * xx + m[..., 1] * yy + m[..., 2] - xx
    v = m[..., 3] * xx + m[..., 4] * yy + m[..., 5] - yy
    u[labels < 0] = 0.0
    v[labels < 0] = 0.0
    return np.stack([u, v], axis=-1)


def _kernelize(dis, coef_kernel):
    """exp(-coef*d) + 1e-8 (epic.cpp:190-195); invalid (+inf) -> 0."""
    with np.errstate(over="ignore"):
        k = np.exp(-coef_kernel * np.where(np.isfinite(dis), dis, np.inf))
    return np.where(np.isfinite(dis), k + 1e-8, 0.0)


def epic(imlab, matches, edges, params: EpicParams = EpicParams(),
         max_iter_dt: int = 256, saliency_map=None):
    """Sparse-to-dense interpolation.

    imlab:   [3, H, W] Lab image (rgb_to_lab output)
    matches: [N, 4] (x1, y1, x2, y2)
    edges:   [H, W] edge cost map (modified in the reference; copied here)
    saliency_map: optional precomputed saliency (batched callers compute it
        for all frames in one dispatch instead of one per epic call)
    Returns flow [H, W, 2] float32.
    """
    return epic_batched([(imlab, matches, edges, saliency_map)], params,
                        max_iter_dt)[0]


def epic_batched(jobs, params: EpicParams = EpicParams(),
                 max_iter_dt: int = 256):
    """EPIC interpolation for a batch of independent problems.

    jobs: list of (imlab, matches, edges, saliency_map-or-None). The two
    geodesic distance transforms (consistency prefilter + interpolation
    k-NN) run as ONE batched device dispatch each across the whole batch —
    the jet-group equivalent of the per-jet `epic()` calls the reference
    makes under OpenMP (slow_flow.cpp:819); host fits stay per job.
    Returns a list of flow [H, W, 2] float32 arrays.
    """
    import jax.numpy as jnp

    from .distance import dist_trf_nnfield_batched

    B = len(jobs)
    state = []
    for imlab, matches, edges, saliency_map in jobs:
        imlab = np.asarray(imlab, np.float32)
        _, h, w = imlab.shape
        matches = np.asarray(matches, np.float32).reshape(-1, 4).copy()
        edges = np.asarray(edges, np.float32).copy()

        # 1. rectify (epic.cpp:15-28)
        matches[:, 0] = np.clip(matches[:, 0], 0, w - 1)
        matches[:, 1] = np.clip(matches[:, 1], 0, h - 1)
        matches[:, 2] = np.clip(matches[:, 2], 0, w - 1)
        matches[:, 3] = np.clip(matches[:, 3], 0, h - 1)

        # 2. edge cost offset
        if params.euc:
            edges = edges + params.euc

        # 3. saliency filter
        if params.saliency_th and len(matches):
            s = np.asarray(saliency_fn(jnp.asarray(imlab), 0.8, 1.0)) \
                if saliency_map is None else np.asarray(saliency_map)
            keep = s[matches[:, 1].astype(int), matches[:, 0].astype(int)] \
                >= params.saliency_th
            matches = matches[keep]
        state.append(dict(matches=matches, edges=edges, hw=(h, w)))

    # 4. consistency prefilter (one batched DT over eligible jobs)
    if params.pref_nn:
        idx = [b for b in range(B) if len(state[b]["matches"]) > 1]
        if idx:
            res = dist_trf_nnfield_batched(
                [state[b]["matches"][:, :2].astype(np.int32) for b in idx],
                [state[b]["edges"] for b in idx],
                [min(params.pref_nn + 1, len(state[b]["matches"]))
                 for b in idx], max_iter_dt)
            for b, (nnf, dis, _, _) in zip(idx, res):
                m = state[b]["matches"]
                vects = m[:, 2:4] - m[:, :2]
                disk = _kernelize(dis, params.coef_kernel)
                est = fit_nadarayawatson(nnf, disk, vects)
                keep = ((est - vects) ** 2).sum(1) < params.pref_th ** 2
                state[b]["matches"] = m[keep]

    # 5. geodesic k-NN for the interpolation (one batched DT)
    flows = [None] * B
    idx = [b for b in range(B) if len(state[b]["matches"])]
    for b in range(B):
        if b not in idx:
            h, w = state[b]["hw"]
            flows[b] = np.zeros((h, w, 2), np.float32)
    if idx:
        res = dist_trf_nnfield_batched(
            [state[b]["matches"][:, :2].astype(np.int32) for b in idx],
            [state[b]["edges"] for b in idx],
            [min(params.nn, len(state[b]["matches"])) for b in idx],
            max_iter_dt)
        for b, (nnf, dis, labels, _) in zip(idx, res):
            m = state[b]["matches"]
            h, w = state[b]["hw"]
            seeds = m[:, :2].astype(np.int32)
            vects = m[:, 2:4] - m[:, :2]
            disk = _kernelize(dis, params.coef_kernel)

            # 6-7. fit + apply
            if params.method.upper() == "LA":
                affine = fit_localaffine(nnf, disk, seeds.astype(np.float32),
                                         vects)
                flow = apply_localaffine(affine, labels, h, w)
            elif params.method.upper() == "NW":
                sv = fit_nadarayawatson(nnf, disk, vects)
                flow = apply_nadarayawatson(sv.astype(np.float32), labels)
            else:
                raise ValueError(
                    f"unknown interpolation method {params.method}")
            flows[b] = flow.astype(np.float32)
    return flows
