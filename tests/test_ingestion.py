"""External-file ingestion contracts: precomputed SED edge maps and
DeepMatching match files must be picked up from tmp/ (slow_flow.cpp:745-784),
exercised through the slow_flow CLI with deep_matching=1."""
import textwrap

import numpy as np

from slowflow_tpu.io import read_flo, write_edges, write_matches
from slowflow_tpu.io.images import write_image


def test_slow_flow_ingests_edges_and_matches(tmp_path):
    from slowflow_tpu.cli.slow_flow import main

    h, w = 56, 64
    u, v = 1.0, 0.5
    rng = np.random.default_rng(3)
    pad = 20
    base = rng.random((h + 2 * pad, w + 2 * pad, 3)) * 255
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax,
                                   base)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(8):
        xs = np.clip(xx + pad - f * u, 0, w + 2 * pad - 2)
        ys = np.clip(yy + pad - f * v, 0, h + 2 * pad - 2)
        x0 = xs.astype(int); y0 = ys.astype(int)
        fx = (xs - x0)[..., None]; fy = (ys - y0)[..., None]
        img = (base[y0, x0] * (1 - fx) * (1 - fy)
               + base[y0, x0 + 1] * fx * (1 - fy)
               + base[y0 + 1, x0] * (1 - fx) * fy
               + base[y0 + 1, x0 + 1] * fx * fy)
        write_image(seq_dir / f"frame_{f:03d}.png", img)

    out_dir = tmp_path / "out"
    cfg = tmp_path / "sf.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    output\t{out_dir}
    Jets\t1
    start\t3
    max_fps\t40
    ref_fps\t40
    jet_fps\t40
    adaptive\t0
    16bit\t0
    raw\t0
    scale\t1.0
    deep_matching\t1
    slow_flow_S\t2
    slow_flow_layers\t1
    slow_flow_niter_alter\t2
    slow_flow_niter_outer\t3
    slow_flow_niter_solver\t15
    slow_flow_occlusion_reasoning\t0
    """))

    # pre-seed tmp/ with *ground-truth* matches and uniform edges: the EPIC
    # init from these alone should already be near the true flow
    tmp = out_dir / "tmp"
    tmp.mkdir(parents=True)
    write_edges(tmp / "edges_3.dat", np.full((h, w), 0.01, np.float32))
    write_edges(tmp / "edges_4.dat", np.full((h, w), 0.01, np.float32))
    ys_g, xs_g = np.mgrid[2:h - 2:5, 2:w - 2:5]
    pts = np.stack([xs_g.ravel(), ys_g.ravel()], 1).astype(np.float32)
    fwd = np.concatenate([pts, pts + [u, v]], 1)
    bwd = np.concatenate([pts, pts - [u, v]], 1)
    write_matches(tmp / "matches_3_4.dat", fwd)
    write_matches(tmp / "matches_4_3.dat", bwd)

    rc = main([str(cfg), "-resume"])
    assert rc == 0
    flow = read_flo(out_dir / "frame_003.flo")
    inner = (slice(10, -10), slice(10, -10))
    err = np.hypot(flow[inner][..., 0] - u, flow[inner][..., 1] - v)
    assert err.mean() < 0.3, err.mean()


def test_slow_flow_jet_selection(tmp_path):
    """-jet N restricts work to one jet and implies resume
    (slow_flow.cpp:184-189, 413-424)."""
    import textwrap

    from slowflow_tpu.cli.slow_flow import main

    h, w = 56, 64
    rng = np.random.default_rng(5)
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    base = rng.random((h + 20, w + 20, 3)) * 255
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(8):
        img = base[yy + 10 - 0, xx + 10]  # static scene is fine here
        write_image(seq_dir / f"frame_{f:03d}.png", img)

    out_dir = tmp_path / "out"
    cfg = tmp_path / "sf.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    output\t{out_dir}
    Jets\t3
    start\t3
    max_fps\t40
    ref_fps\t40
    jet_fps\t40
    adaptive\t0
    16bit\t0
    raw\t0
    scale\t1.0
    deep_matching\t0
    slow_flow_S\t2
    slow_flow_layers\t1
    slow_flow_niter_alter\t1
    slow_flow_niter_outer\t2
    slow_flow_niter_solver\t10
    slow_flow_occlusion_reasoning\t0
    """))
    rc = main([str(cfg), "-jet", "1"])
    assert rc == 0
    assert (out_dir / "frame_004.flo").exists()      # jet 1 only
    assert not (out_dir / "frame_003.flo").exists()  # jet 0 untouched
    assert not (out_dir / "frame_005.flo").exists()  # jet 2 untouched
