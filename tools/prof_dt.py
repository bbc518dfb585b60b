"""Profile track_final_pair at a production-shaped workload.

Shape per the reference's cfgs/dense_tracking.cfg regime: Jets=10 at the
working resolution 480x270, capacity 16, 5 alternations, 20 tryouts.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _moving_sequence  # noqa: E402


def build_inputs(h, w, jets, seed=0):
    import jax.numpy as jnp

    from slowflow_tpu.core.conv import DERIV_5PT, conv_horiz, conv_vert
    from slowflow_tpu.core.image import normalize_sequence

    u, v = 1.5, -0.8
    frames = _moving_sequence(jets + 1, h, w, u, v, seed=seed)  # [J+1,3,h,w]
    stack, avg, std = normalize_sequence(frames)
    dx = np.asarray(conv_horiz(jnp.asarray(stack), DERIV_5PT))
    dy = np.asarray(conv_vert(jnp.asarray(stack), DERIV_5PT))
    data = np.moveaxis(stack, 1, -1)
    data_dx = np.moveaxis(dx, 1, -1)
    data_dy = np.moveaxis(dy, 1, -1)

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx, r = h // 2, w // 2, min(h, w) // 6
    fg = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
    fwd = np.zeros((jets, h, w, 2), np.float32)
    fwd[..., 0] = np.where(fg, -u, u)
    fwd[..., 1] = v
    fwd += rng.normal(0, 0.08, fwd.shape).astype(np.float32)
    bwd = (-fwd).astype(np.float32)
    smooth_weight = np.full((h, w), 0.4, np.float32)
    return data, data_dx, data_dy, fwd, bwd, smooth_weight


def run_once(h=270, w=480, jets=10, verbose=True):
    from slowflow_tpu.tracking.driver import TrackingConfig, track_final_pair

    data, ddx, ddy, fwd, bwd, sw = build_inputs(h, w, jets)
    cfg = TrackingConfig(jets=jets, rates=1, skip_pixel=1, capacity=16,
                         alternate=5, hyp_neigh_tryouts=20,
                         epic_interpolation=False, seed=1)
    rate_flows = [(fwd, bwd, None)]
    t0 = time.time()
    flow, occ, info = track_final_pair(cfg, rate_flows, fwd, bwd, None,
                                       data, ddx, ddy, sw, verbose=verbose)
    wall = time.time() - t0
    gt = fwd.sum(0)[::2, ::2, 0] / 2     # trajectories accumulate over jets
    err = float(np.median(np.abs(flow[8:-8, 8:-8, 0] - gt[8:-8, 8:-8])))
    return wall, info["timing"], err


def ab_batched(h=270, w=480, jets=10, finals=4):
    """Serial vs batched stage-3 A/B at production shape (round-4 decision:
    the CPU A/B was 0.83x; on the latency-bound TPU the F axis should pay)."""
    from slowflow_tpu.tracking.driver import (
        TrackingConfig, track_final_pair, track_final_pairs_batched)

    cfg = TrackingConfig(jets=jets, rates=1, skip_pixel=1, capacity=16,
                         alternate=5, hyp_neigh_tryouts=20,
                         epic_interpolation=False, seed=1)
    jobs = []
    for s in range(finals):
        data, ddx, ddy, fwd, bwd, sw = build_inputs(h, w, jets, seed=s)
        jobs.append(dict(rate_flows=[(fwd, bwd, None)], forward=fwd,
                         backward=bwd, occlusions=None, data=data,
                         data_dx=ddx, data_dy=ddy, smooth_weight=sw,
                         epic_ctx=None))

    def serial():
        for j in jobs:
            track_final_pair(cfg, j["rate_flows"], j["forward"],
                             j["backward"], None, j["data"], j["data_dx"],
                             j["data_dy"], j["smooth_weight"])

    serial()                                     # compile both paths
    track_final_pairs_batched(cfg, jobs)
    t0 = time.time()
    serial()
    t_serial = time.time() - t0
    t0 = time.time()
    track_final_pairs_batched(cfg, jobs)
    t_batched = time.time() - t0
    print(f"stage3 A/B finals={finals}: serial {t_serial:.2f}s "
          f"({t_serial / finals:.2f}/final)  batched {t_batched:.2f}s "
          f"({t_batched / finals:.2f}/final)  "
          f"speedup {t_serial / t_batched:.2f}x")
    return t_serial, t_batched


if __name__ == "__main__":
    if "--ab" in sys.argv:
        ab_batched()
        sys.exit(0)
    wall, timing, err = run_once()
    print("warmup wall:", round(wall, 2), "s")
    wall2, timing2, err = run_once(verbose=False)
    print("second wall:", round(wall2, 2), "s  err:", round(err, 3))
    for k, val in timing2.items():
        print(f"  {k:14s} {val:8.3f} s")
