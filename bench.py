"""Headline benchmark: frame-pairs/sec per chip for multi-frame jet estimation.

Workload (BASELINE.md): the Slow Flow multi-frame variational jet solve on
1080p high-speed jets at the default working configuration
(cfgs/slow_flow.cfg: scale 0.25 -> 480x270 working resolution, S=3 window,
5 pyramid layers at p_scale 0.9, 10 alter x 10 outer x 30 SOR iterations,
occlusion reasoning on), batched over jets on one chip.

vs_baseline: measured throughput divided by an estimated single-core CPU
reference throughput. The C++ reference cannot run here (its GCO/TRW-S/
OpenCV/MATLAB dependencies are absent), so the baseline is *estimated* by
timing a vectorized NumPy implementation of one outer iteration of the same
energy (warp + derivatives + IRLS assembly + 30 SOR sweeps) and scaling by
the iteration counts and pyramid area factor — a memory-bound proxy for the
reference's single-threaded SSE inner loops (per-jet work is single-threaded
in the reference too; OpenMP only spreads jets over cores).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _moving_sequence(f, h, w, u, v, seed=0):
    """Two-layer scene: smooth background translating (u, v) px/frame with a
    foreground patch moving the opposite way — real occlusion boundaries keep
    the occlusion reasoning and the alternation loop honestly busy."""
    rng = np.random.default_rng(seed)
    pad = 16
    base = rng.random((h + 2 * pad, w + 2 * pad)).astype(np.float32) * 255
    fg = rng.random((h + 2 * pad, w + 2 * pad)).astype(np.float32) * 255
    for _ in range(2):  # cheap smoothing
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
        fg = 0.25 * (np.roll(fg, 1, 0) + np.roll(fg, -1, 0)
                     + np.roll(fg, 1, 1) + np.roll(fg, -1, 1))
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    ref = (f - 1) // 2

    def sample(img, dx_t, dy_t):
        xs = np.clip(xx + pad - dx_t, 0, w + 2 * pad - 2)
        ys = np.clip(yy + pad - dy_t, 0, h + 2 * pad - 2)
        x0 = xs.astype(int); y0 = ys.astype(int)
        fx = xs - x0; fy = ys - y0
        return (img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x0 + 1] * fx * (1 - fy)
                + img[y0 + 1, x0] * (1 - fx) * fy
                + img[y0 + 1, x0 + 1] * fx * fy)

    cy, cx, r = h // 2, w // 2, min(h, w) // 6
    for s in range(-ref, f - ref):
        im = sample(base, s * u, s * v)
        im_fg = sample(fg, -s * u, s * v)          # foreground counter-moves
        in_fg = ((yy - (cy + s * v)) ** 2
                 + (xx - (cx - s * u)) ** 2) < r * r
        im = np.where(in_fg, im_fg, im)
        frames.append(np.repeat(im[None], 3, 0))
    return np.stack(frames)


def tpu_jets_per_sec(batch, h, w, p, repeats=7):
    """Measures the jet solve with device-resident inputs: staging the
    dataset to HBM is excluded from the timed region (the tunneled dev
    backend moves host data at ~15 MB/s, which would otherwise dominate;
    production hosts feed chips at GB/s). Completion is forced by fetching
    a scalar reduction of all outputs — the only reliable barrier here."""
    import jax
    import jax.numpy as jnp

    from slowflow_tpu.variational.multiframe import variational_mt_batched

    f = 2 * p.ref + 1
    seq = jnp.asarray(np.stack(
        [_moving_sequence(f, h, w, 1.5 + 0.2 * s, -0.8, seed=s)
         for s in range(batch)]))
    wx = jnp.zeros((batch, h, w), jnp.float32)
    wy = jnp.zeros((batch, h, w), jnp.float32)
    jax.block_until_ready(seq)

    def run(k=1):
        # k > 1: enqueue k executions of the SAME compiled program before
        # the single scalar fetch — steady-state pipelined dispatch, as the
        # CLIs run it (prefetch thread keeps the device queue non-empty).
        # The k=1 number pays one dispatch+fetch round trip per batch.
        outs = [variational_mt_batched(wx, wy, seq, p) for _ in range(k)]
        return float(sum(jnp.sum(o) for out in outs for o in out))

    run()  # compile + warmup
    # sanity: the solve must have recovered most of the motion
    out = variational_mt_batched(wx, wy, seq, p)
    err = abs(float(np.median(np.asarray(out[0])[0, 8:-8, 8:-8])) - 1.5)
    times = []
    times3 = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(3)
        times3.append(time.perf_counter() - t0)
    # both methodologies are reported separately in the JSON (the headline
    # takes the better one, tagged): per-dispatch pays one dispatch+fetch
    # round trip per batch; pipelined-k3 amortizes it over 3 enqueued
    # executions, the steady state the CLIs run in
    t_single = min(times)
    t_pipe = min(times3) / 3
    return batch / min(t_single, t_pipe), min(t_single, t_pipe), err, \
        batch / t_single, batch / t_pipe


def cpu_baseline_jets_per_sec(h, w, p, repeats=3):
    """NumPy proxy of the reference's per-jet cost (see module docstring).
    Best of `repeats` to suppress scheduler noise on the shared host."""
    return max(_cpu_baseline_once(h, w, p) for _ in range(repeats))


def _cpu_baseline_once(h, w, p):
    rng = np.random.default_rng(0)
    n = 2 * p.ref

    def shift(x, dy, dx):
        return np.roll(x, (dy, dx), axis=(-2, -1))

    im = rng.random((3, h, w)).astype(np.float32)
    wx = np.zeros((h, w), np.float32)
    wy = np.zeros((h, w), np.float32)

    t0 = time.perf_counter()
    # one outer iteration: warp + 17 derivative planes per frame offset
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fields = []
    for s in range(n):
        xq = np.clip(xx + (s - p.ref) * wx, 0, w - 1)
        yq = np.clip(yy + (s - p.ref) * wy, 0, h - 1)
        x0 = xq.astype(np.int32); y0 = yq.astype(np.int32)
        warped = im[:, y0, x0]  # NN stand-in for the bilinear warp cost
        for _ in range(17):
            fields.append(0.5 * (shift(warped, 0, 1) - shift(warped, 0, -1)))
    stack = np.stack(fields)
    # IRLS data assembly: one pass over all planes
    a11 = (stack * stack).sum(0)[0]
    b1 = stack.sum(0)[0]
    # 30 red-black SOR sweeps (2 half sweeps each)
    du = np.zeros((h, w), np.float32)
    whv = np.abs(a11) + 1.0
    for _ in range(p.niter_solver):
        for _ in range(2):
            sig = (shift(du, 1, 0) + shift(du, -1, 0)
                   + shift(du, 0, 1) + shift(du, 0, -1)) * whv
            du = 0.1 * du + 0.9 * (b1 + sig) / (4 * whv + a11 + 1e-3)
    t_outer = time.perf_counter() - t0

    pyr_area = sum((p.p_scale ** 2) ** l for l in range(p.layers))
    t_jet = t_outer * p.niter_alter * p.niter_outer * pyr_area
    return 1.0 / t_jet


def dt_final_pair_seconds(h=270, w=480, jets=10, seed=0):
    """Stage-3 dense tracking at the production shape (Jets=10, working
    resolution, capacity 16, 5 alternations, 20 tryouts, EPIC-interpolated
    hypotheses ON — the production default, driver.py TrackingConfig):
    seconds per final frame pair and the recovered-flow error."""
    import jax.numpy as jnp

    from slowflow_tpu.core.conv import DERIV_5PT, conv_horiz, conv_vert
    from slowflow_tpu.core.image import normalize_sequence, rgb_to_lab
    from slowflow_tpu.epic import EpicParams
    from slowflow_tpu.epic.edges import detect_edges
    from slowflow_tpu.tracking.driver import TrackingConfig, track_final_pair

    u, v = 1.5, -0.8
    frames = _moving_sequence(jets + 1, h, w, u, v, seed=seed)
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
    sw = np.full((h, w), 0.4, np.float32)

    from dataclasses import replace

    cfg = TrackingConfig(jets=jets, rates=1, skip_pixel=1, capacity=16,
                         alternate=5, hyp_neigh_tryouts=20,
                         epic_interpolation=True, seed=1)
    rate_flows = [(fwd, bwd, None)]
    im0 = jnp.asarray(frames[0])
    epic_ctx = (np.asarray(rgb_to_lab(im0)),
                np.asarray(detect_edges(im0)), EpicParams.sintel())

    def run(c):
        t0 = time.perf_counter()
        flow, occ, info = track_final_pair(c, rate_flows, fwd, bwd, None,
                                           data, data_dx, data_dy, sw,
                                           epic_ctx=epic_ctx)
        return time.perf_counter() - t0, flow

    # a 2-alternation pass compiles every kernel (the alternation loop is
    # host-level and reuses the cached jits), so the warmup stays short
    run(replace(cfg, alternate=2))
    wall, flow = run(cfg)
    gt = fwd.sum(0)[::2, ::2, 0] / 2
    err = float(np.median(np.abs(flow[8:-8, 8:-8, 0] - gt[8:-8, 8:-8])))
    return wall, err


def _backend_reachable(timeout_s=300):
    """Probe JAX device discovery in a subprocess with a hard timeout: when
    the tunneled TPU backend is down, `jax.devices()` hangs indefinitely
    instead of erroring, which would hang the whole bench run."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _stale_record():
    """Outage fallback: the most recent BENCH_r*.json whose measured value
    is non-zero, re-emitted verbatim with a `stale` marker, so every round
    has a comparable number even across tunnel outages."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                rec = json.load(fh)
            parsed = rec.get("parsed") or {}
            if parsed.get("value", 0) > 0:
                best = (os.path.basename(path), parsed)
        except (json.JSONDecodeError, OSError):
            continue
    note = ("TPU backend unreachable (device discovery timed out); "
            "tunnel outage")
    if best is None:
        return {"metric": "frame-pairs/sec per chip (1080p jets @ scale "
                          "0.25, S=3, full slow_flow config)",
                "value": 0.0, "unit": "jets/s", "vs_baseline": 0.0,
                "error": note + "; no prior measured record found"}
    name, parsed = best
    out = dict(parsed)
    out["stale"] = True
    out["stale_from"] = name
    out["error"] = note + f"; values re-emitted from {name}"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="jet batch; 0 = champion config if recorded, else 4")
    ap.add_argument("--no-dt", action="store_true",
                    help="skip the dense-tracking stage metric")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="skip the end-to-end CLI pipeline metric")
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--small", action="store_true",
                    help="reduced workload for smoke testing")
    args = ap.parse_args()

    if not (args.small or os.environ.get("JAX_PLATFORMS") == "cpu") \
            and not _backend_reachable():
        # emit a well-formed line rather than hanging the driver — and keep
        # the round's record comparable by re-emitting the last MEASURED
        # values from the in-repo BENCH_r*.json history, clearly marked
        print(json.dumps(_stale_record()))
        return

    from slowflow_tpu.variational.multiframe import MultiFrameParams

    if args.small:
        p = MultiFrameParams(S=3, rho=(1.0, 1.0), omega=(0.0, 2.0), layers=2,
                             niter_alter=2, niter_outer=3, niter_solver=10,
                             occlusion_reasoning=True, smoothing=1)
        h, w, batch = 96, 128, 2
    else:
        # cfgs/slow_flow.cfg defaults at the 1080p*0.25 working resolution
        p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                             rho=(1.0, 1.0), omega=(0.0, 2.0),
                             layers=5, p_scale=0.9,
                             niter_alter=10, niter_outer=10, niter_inner=1,
                             niter_solver=30, occlusion_reasoning=True,
                             smoothing=1)
        h, w, batch = args.height, args.width, args.batch or 4

    # measured-champion solve configuration from tools/prof_merged.py
    # --sweep (batch + kernel route); explicit --batch overrides the batch
    champion = None
    here = os.path.dirname(os.path.abspath(__file__))
    if not args.small:
        for cf in ("/tmp/solve_champion.json",
                   os.path.join(here, "tools", "solve_champion_measured.json")):
            if os.path.exists(cf):
                with open(cf) as fh:
                    champion = json.load(fh)
                break
    if champion:
        from dataclasses import replace

        p = replace(p, merge_warp=champion["merge_warp"],
                    jet_vmap=(champion["mode"] == "vmap"),
                    unroll_jets=(champion["mode"] == "unroll"),
                    **({"pallas_sor": champion["pallas_sor"]}
                       if "pallas_sor" in champion else {}),
                    **({"fused_solve": champion["fused_solve"]}
                       if "fused_solve" in champion else {}),
                    **({"strip_r": champion["strip_r"]}
                       if "strip_r" in champion else {}),
                    **({"self_mask": champion["self_mask"]}
                       if "self_mask" in champion else {}),
                    **({"fuse_occ": champion["fuse_occ"]}
                       if "fuse_occ" in champion else {}),
                    **({"packed_sor": champion["packed_sor"]}
                       if "packed_sor" in champion else {}))
        if not args.batch:
            batch = champion["batch"]

    jps, wall, flow_err, jps_single, jps_pipe = tpu_jets_per_sec(
        batch, h, w, p)
    # Baseline convention (explicit): the denominator is the MEASURED
    # per-jet wall-clock of the reference's own variational_mt.cpp+solver.c
    # (unmodified, -O3 -msse4) on this exact workload, single thread — the
    # reference never parallelizes inside a jet (slow_flow.cpp:706: OpenMP
    # spreads whole jets across cores), so t_jet/core is the ground truth
    # and an N-core reference scales it by at most N. The harness is
    # tools/measure_mt_baseline.py; it caches /tmp/mt_baseline.json. The
    # 8-core equivalent is also published so both conventions are on the
    # record. Fallback when the harness result is absent: the round-2
    # NumPy-proxy floor 0.0735 jets/s, which is ~7x MORE generous to the
    # reference than its measured 0.0103 jets/s.
    measured = None
    here = os.path.dirname(os.path.abspath(__file__))
    for mt_json in ("/tmp/mt_baseline.json",
                    os.path.join(here, "tools", "mt_baseline_measured.json")):
        if os.path.exists(mt_json):
            with open(mt_json) as fh:
                measured = json.load(fh)
            break
    if measured:
        base_jps = measured["jets_per_sec_core"]
        base_kind = "measured reference variational_mt (1 core)"
    else:
        base_jps = max(cpu_baseline_jets_per_sec(h, w, p) * 5.0, 0.0735)
        base_kind = "numpy proxy (1-core equivalent)"

    out = {
        "metric": "frame-pairs/sec per chip (1080p jets @ scale 0.25, S=3, "
                  "full slow_flow config)",
        "value": round(jps, 3),
        "unit": "jets/s",
        "vs_baseline": round(jps / base_jps, 1),
        "baseline_convention": "single-core reference; see vs_baseline_8core",
        "baseline_kind": base_kind,
        "baseline_estimate_jets_per_sec": round(base_jps, 5),
        "vs_baseline_8core": round(jps / (8 * base_jps), 1),
        "flow_recovery_err_px": round(flow_err, 3),
        "batch": batch, "height": h, "width": w,
        "wall_s_per_batch": round(wall, 3),
        # both measurement methodologies on the record (the headline value
        # is their max, tagged here — see tpu_jets_per_sec)
        "jets_per_sec_single_dispatch": round(jps_single, 3),
        "jets_per_sec_pipelined_k3": round(jps_pipe, 3),
        "value_method": ("pipelined_k3" if jps_pipe >= jps_single
                         else "single_dispatch"),
    }
    if champion:
        out["solve_config"] = champion
    if not (args.no_dt or args.small):
        dt_wall, dt_err = dt_final_pair_seconds()
        out["dt_seconds_per_final_pair"] = round(dt_wall, 2)
        out["dt_flow_err_px"] = round(dt_err, 3)

    # end-to-end pipeline through the REAL CLIs (adaptive_fr -> slow_flow ->
    # dense_tracking) on a teaser-shaped sequence — the number the north
    # star is defined on; compact shape here, tools/bench_pipeline.py scales
    # to the full 225-jet teaser
    if not (args.no_pipeline or args.small):
        try:
            from pathlib import Path

            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from bench_pipeline import run_pipeline
            out["pipeline"] = run_pipeline(Path("/tmp/bench_pipeline_run"),
                                           jets=8, finals=2, samples=2,
                                           threads=2)
        except Exception as e:  # never lose the kernel numbers to stage 3
            out["pipeline_error"] = repr(e)[:200]
        # a separately-run full-scale pipeline record (tools/bench_pipeline.py
        # --jets 225 --save ...) rides along when present
        for pf in ("/tmp/bench_pipeline_full.json",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools", "bench_pipeline_measured.json")):
            if os.path.exists(pf):
                with open(pf) as fh:
                    out["pipeline_full"] = json.load(fh)
                break

    # roofline accounting (tools/roofline.py caches its JSON when run)
    for rf in ("/tmp/roofline.json",
               os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "roofline_measured.json")):
        if os.path.exists(rf):
            with open(rf) as fh:
                r = json.load(fh)
            out["roofline"] = {k: r[k] for k in
                               ("outer_iter_ms", "vpu_util", "hbm_util")}
            break
    print(json.dumps(out))


if __name__ == "__main__":
    main()
