"""Raw Bayer 16-bit path end-to-end: mosaiced 16-bit input frames are
demosaiced (raw_demosaicing modes), channel-confidence weighted, and solved
through the slow_flow CLI — the 'sheeps' teaser data shape
(slow_flow.cpp:470-528, cfgs/slow_flow.cfg:14-17)."""
import textwrap

import numpy as np
import pytest

from slowflow_tpu.io import read_flo
from slowflow_tpu.io.images import write_image, read_image

U, V = 1.0, 0.5
H, W = 64, 88
RED_X, RED_Y = 1, 0


def mosaic(rgb):
    """RGB [H, W, 3] -> Bayer mosaic [H, W] with red at (RED_X, RED_Y)."""
    h, w, _ = rgb.shape
    yy, xx = np.mgrid[0:h, 0:w]
    blue_row = (yy + (1 - RED_Y)) % 2 == 0
    g_in_blue = blue_row & ((xx + RED_X) % 2 == 0)
    b_site = blue_row & ~g_in_blue
    g_in_red = ~blue_row & ((xx + (1 - RED_X)) % 2 == 0)
    r_site = ~blue_row & ~g_in_red
    out = np.zeros((h, w), np.float32)
    out[g_in_blue | g_in_red] = rgb[..., 1][g_in_blue | g_in_red]
    out[b_site] = rgb[..., 2][b_site]
    out[r_site] = rgb[..., 0][r_site]
    return out


def test_raw_16bit_slow_flow(tmp_path):
    from slowflow_tpu.cli.slow_flow import main

    rng = np.random.default_rng(9)
    pad = 30
    base = rng.random((H + 2 * pad, W + 2 * pad, 3)) * 255
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax,
                                   base)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    yy, xx = np.mgrid[0:H, 0:W]
    for f in range(8):
        xs = np.clip(xx + pad - f * U, 0, W + 2 * pad - 2)
        ys = np.clip(yy + pad - f * V, 0, H + 2 * pad - 2)
        x0 = xs.astype(int); y0 = ys.astype(int)
        fx = (xs - x0)[..., None]; fy = (ys - y0)[..., None]
        img = (base[y0, x0] * (1 - fx) * (1 - fy)
               + base[y0, x0 + 1] * fx * (1 - fy)
               + base[y0 + 1, x0] * (1 - fx) * fy
               + base[y0 + 1, x0 + 1] * fx * fy)
        bayer16 = mosaic(img) * 256.0   # 16-bit intensity range
        write_image(seq_dir / f"frame_{f:03d}.png", bayer16, bit16=True)

    # sanity: files really are 16-bit single channel
    probe = read_image(seq_dir / "frame_000.png")
    assert probe.ndim == 2 and probe.max() > 255.0

    cfg = tmp_path / "sf.cfg"
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/frame_%03i.png
    output\t{tmp_path}/sf_out
    Jets\t2
    start\t3
    max_fps\t40
    ref_fps\t20
    jet_fps\t40
    adaptive\t0
    16bit\t1
    raw\t1
    raw_demosaicing\t0
    raw_red_loc\t{RED_X},{RED_Y}
    raw_weight\t2.0
    scale\t1.0
    deep_matching\t0
    slow_flow_S\t2
    slow_flow_layers\t2
    slow_flow_p_scale\t0.8
    slow_flow_occlusion_reasoning\t1
    slow_flow_niter_alter\t2
    slow_flow_niter_outer\t4
    slow_flow_niter_solver\t20
    """))
    rc = main([str(cfg), "-batch", "2"])
    assert rc == 0

    flow = read_flo(tmp_path / "sf_out" / "frame_003.flo")
    inner = (slice(10, -10), slice(10, -10))
    err = np.hypot(flow[inner][..., 0] - U, flow[inner][..., 1] - V)
    assert err.mean() < 0.35, err.mean()
