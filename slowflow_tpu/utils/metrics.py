"""Flow accuracy metrics: EPE / AAE / RMS (utils/utils.cpp:39-167)."""
from __future__ import annotations

import numpy as np

from ..io.flo import UNKNOWN_FLOW_THRESH


def _valid(fu, fv, gu, gv, mask=None):
    v = (np.abs(gu) <= UNKNOWN_FLOW_THRESH) & (np.abs(gv) <= UNKNOWN_FLOW_THRESH)
    v &= (np.abs(fu) <= UNKNOWN_FLOW_THRESH) & (np.abs(fv) <= UNKNOWN_FLOW_THRESH)
    if mask is not None:
        v &= np.asarray(mask) != 0
    return v


def compute_epe(flow, gt, mask=None) -> float:
    """Mean endpoint error. flow/gt are [H, W, 2] (u, v)."""
    fu, fv = np.moveaxis(np.asarray(flow, np.float64), -1, 0)
    gu, gv = np.moveaxis(np.asarray(gt, np.float64), -1, 0)
    v = _valid(fu, fv, gu, gv, mask)
    if not v.any():
        return 0.0
    err = np.sqrt((fu - gu) ** 2 + (fv - gv) ** 2)
    return float(err[v].mean())


def compute_aae(flow, gt, mask=None) -> float:
    """Mean angular error in radians (3D angle with w=1)."""
    fu, fv = np.moveaxis(np.asarray(flow, np.float64), -1, 0)
    gu, gv = np.moveaxis(np.asarray(gt, np.float64), -1, 0)
    v = _valid(fu, fv, gu, gv, mask)
    if not v.any():
        return 0.0
    n1 = np.sqrt(fu * fu + fv * fv + 1.0)
    n2 = np.sqrt(gu * gu + gv * gv + 1.0)
    cos = np.minimum((fu * gu + fv * gv + 1.0) / (n1 * n2), 1.0)
    return float(np.arccos(cos)[v].mean())


def compute_rms(im1, im2, flow=None) -> float:
    """Mean per-pixel color distance between two [3, H, W] images."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    d = np.sqrt(((im1 - im2) ** 2).sum(axis=0))
    return float(d.mean())
