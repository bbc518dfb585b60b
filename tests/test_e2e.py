"""End-to-end pipeline test: synthetic sequence -> adaptiveFR -> slow_flow ->
dense_tracking through the real CLI entry points (the reference's
example-driven e2e discipline, SURVEY.md §4)."""
import os
import textwrap

import numpy as np
import pytest

from slowflow_tpu.io import read_flo
from slowflow_tpu.io.images import write_image


U, V = 1.0, 0.5          # per-frame translation
H, W = 72, 96
N_FRAMES = 12
START = 4


def make_sequence(tmp_path):
    """Smooth random texture translating at (U, V) px/frame."""
    rng = np.random.default_rng(7)
    pad = 40
    base = rng.random((H + 2 * pad, W + 2 * pad, 3)) * 255
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax, base)
    # renormalize contrast
    base = (base - base.min()) / (base.max() - base.min()) * 255

    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    yy, xx = np.mgrid[0:H, 0:W]
    for f in range(N_FRAMES):
        xs = xx + pad - f * U
        ys = yy + pad - f * V
        x0 = np.floor(xs).astype(int); y0 = np.floor(ys).astype(int)
        fx = (xs - x0)[..., None]; fy = (ys - y0)[..., None]
        img = (base[y0, x0] * (1 - fx) * (1 - fy)
               + base[y0, x0 + 1] * fx * (1 - fy)
               + base[y0 + 1, x0] * (1 - fx) * fy
               + base[y0 + 1, x0 + 1] * fx * fy)
        write_image(seq_dir / f"frame_{f:03d}.png", img)
    return seq_dir


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    seq_dir = make_sequence(tmp_path)
    return tmp_path, seq_dir


def test_adaptive_fr_stage(pipeline):
    tmp_path, seq_dir = pipeline
    from slowflow_tpu.cli.adaptive_fr import main

    rc = main(["-path", str(tmp_path), "-folder", "seq",
               "-format", "frame_%03i.png", "-scale", "0.5", "-skip", "2",
               "-samples", "2", "-step", "2", "-start", "0"])
    assert rc == 0
    qf = seq_dir / "quantil.dat"
    assert qf.exists()
    quantil = float(qf.read_text().splitlines()[0])
    # flow magnitude per frame ~ |(U, V)| = 1.118 (after un-scaling)
    assert 0.4 < quantil < 2.5, quantil


def test_slow_flow_stage(pipeline):
    tmp_path, seq_dir = pipeline
    from slowflow_tpu.cli.slow_flow import main

    cfg = tmp_path / "slow_flow.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    output\t{tmp_path}/sf_out
    Jets\t2
    start\t{START}
    max_fps\t40
    ref_fps\t20
    jet_fps\t40
    adaptive\t0
    16bit\t0
    raw\t0
    scale\t1.0
    deep_matching\t0
    slow_flow_method\tsymmetric
    slow_flow_S\t2
    slow_flow_dataterm\t1
    slow_flow_smoothing\t1
    slow_flow_delta\t1.0
    slow_flow_gamma\t6.0
    slow_flow_alpha\t4.0
    slow_flow_layers\t2
    slow_flow_p_scale\t0.8
    slow_flow_occlusion_reasoning\t1
    slow_flow_niter_alter\t2
    slow_flow_niter_outer\t4
    slow_flow_niter_solver\t20
    """))
    rc = main([str(cfg), "-batch", "2"])
    assert rc == 0

    out = tmp_path / "sf_out"
    fwd1 = out / "frame_004.flo"
    fwd2 = out / "frame_005.flo"
    bwd1 = out / "frame_005_back.flo"
    assert fwd1.exists() and fwd2.exists() and bwd1.exists()
    assert (out / "config.cfg").exists()
    # occlusion maps use the reference's plain-integer naming
    # (slow_flow.cpp:899: occlusion/frame_<n>.pbm)
    assert (out / "occlusion" / "frame_4.pbm").exists()

    flow = read_flo(fwd1)
    inner = (slice(12, -12), slice(12, -12))
    err = np.hypot(flow[inner][..., 0] - U, flow[inner][..., 1] - V)
    assert err.mean() < 0.35, err.mean()
    back = read_flo(bwd1)
    err_b = np.hypot(back[inner][..., 0] + U, back[inner][..., 1] + V)
    assert err_b.mean() < 0.35, err_b.mean()

    # config snapshot carries the normalization stats for dense_tracking
    text = (out / "config.cfg").read_text()
    assert "slow_flow_img_norm_avg_1" in text
    assert "jet_fps" in text


def test_dense_tracking_stage(pipeline):
    tmp_path, seq_dir = pipeline
    from slowflow_tpu.cli.dense_tracking import main

    cfg = tmp_path / "dense_tracking.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    jet_estimation\t{tmp_path}/sf_out/
    flow_format\tframe_%03i
    output\t{tmp_path}/dt_out
    start\t{START}
    max_fps\t40
    ref_fps\t20
    ref_fps_F\t1
    16bit\t0
    raw\t0
    scale\t1.0
    acc_skip_pixel\t0
    acc_occlusion\t0
    acc_epic_interpolation\t1
    acc_epic_skip\t2
    acc_alternate\t2
    acc_trws_max_iter\t5
    acc_neigh_hyp\t2
    acc_hyp_neigh_tryouts\t4
    acc_consistency_threshold\t1.0
    acc_brightness_constancy\t0.1
    acc_gradient_constancy\t1.0
    seed\t3
    """))
    rc = main([str(cfg)])
    assert rc == 0

    out = tmp_path / "dt_out"
    flo = out / f"frame_{START:03d}.flo"
    assert flo.exists()
    assert (out / "occlusions" / f"frame_{START}.pbm").exists()
    assert (out / "result.info").exists()

    flow = read_flo(flo)
    # Jets = 40/(20*1) = 2 -> final flow = 2 * (U, V)
    inner = (slice(12, -12), slice(12, -12))
    err = np.hypot(flow[inner][..., 0] - 2 * U, flow[inner][..., 1] - 2 * V)
    assert err.mean() < 0.6, err.mean()


def test_dense_tracking_with_jet_occlusions(pipeline):
    """acc_occlusion 1 ingests the slow_flow occlusion PBMs and gates the
    accumulation + energies with them (dense_tracking.cpp:1157-1201)."""
    tmp_path, seq_dir = pipeline
    from slowflow_tpu.cli.dense_tracking import main

    cfg = tmp_path / "dense_tracking_occ.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    jet_estimation\t{tmp_path}/sf_out/
    flow_format\tframe_%03i
    output\t{tmp_path}/dt_occ_out
    start\t{START}
    max_fps\t40
    ref_fps\t20
    ref_fps_F\t1
    16bit\t0
    raw\t0
    scale\t1.0
    acc_skip_pixel\t0
    acc_occlusion\t1
    acc_epic_interpolation\t1
    acc_alternate\t2
    acc_trws_max_iter\t5
    acc_neigh_hyp\t2
    acc_hyp_neigh_tryouts\t4
    seed\t3
    """))
    rc = main([str(cfg)])
    assert rc == 0
    flow = read_flo(tmp_path / "dt_occ_out" / f"frame_{START:03d}.flo")
    inner = (slice(12, -12), slice(12, -12))
    err = np.hypot(flow[inner][..., 0] - 2 * U, flow[inner][..., 1] - 2 * V)
    assert err.mean() < 0.6, err.mean()


def test_dense_tracking_select_and_resume(pipeline):
    """-select N runs exactly one final pair (dense_tracking.cpp:464-466);
    -resume skips existing outputs."""
    tmp_path, seq_dir = pipeline
    from slowflow_tpu.cli.dense_tracking import main

    cfg = tmp_path / "dense_tracking_sel.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    jet_estimation\t{tmp_path}/sf_out/
    flow_format\tframe_%03i
    output\t{tmp_path}/dt_sel_out
    start\t{START}
    max_fps\t40
    ref_fps\t20
    ref_fps_F\t3
    16bit\t0
    raw\t0
    scale\t1.0
    acc_skip_pixel\t0
    acc_occlusion\t0
    acc_epic_interpolation\t1
    acc_alternate\t1
    acc_trws_max_iter\t3
    acc_neigh_hyp\t2
    acc_hyp_neigh_tryouts\t4
    seed\t3
    """))
    rc = main([str(cfg), "-select", "0"])
    assert rc == 0
    out = tmp_path / "dt_sel_out"
    assert (out / f"frame_{START:03d}.flo").exists()
    # only pair 0 was selected: no outputs for later pairs
    assert not (out / f"frame_{START + 2:03d}.flo").exists()

    # -resume run skips the already-done pair without rewriting it
    mtime = (out / f"frame_{START:03d}.flo").stat().st_mtime_ns
    rc = main([str(cfg), "-select", "0", "-resume"])
    assert rc == 0
    assert (out / f"frame_{START:03d}.flo").stat().st_mtime_ns == mtime
