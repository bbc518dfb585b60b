"""Sintel-style frame numbering end-to-end: files named out_<frame>_<sub>.png
with 42 subframes per frame; -sintel multiplies `start` by 1000 and encodes
both indices in all output names (slow_flow.cpp:244-251, 444-465)."""
import textwrap

import numpy as np

from slowflow_tpu.io import read_flo
from slowflow_tpu.io.images import write_image

U, V = 1.0, 0.5
H, W = 56, 72


def test_sintel_numbering_slow_flow(tmp_path):
    from slowflow_tpu.cli.slow_flow import main

    rng = np.random.default_rng(13)
    pad = 24
    base = rng.random((H + 2 * pad, W + 2 * pad, 3)) * 255
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax,
                                   base)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    yy, xx = np.mgrid[0:H, 0:W]
    # the window around start 491000 spans the 42-subframe wrap backwards:
    # offsets -1..3 -> (490, 41), (491, 0..3); generate a couple extra
    ids = [(490, 40), (490, 41)] + [(491, s) for s in range(0, 6)]
    for f, (sf, sub) in enumerate(ids):
        xs = np.clip(xx + pad - f * U, 0, W + 2 * pad - 2)
        ys = np.clip(yy + pad - f * V, 0, H + 2 * pad - 2)
        x0 = xs.astype(int); y0 = ys.astype(int)
        fx = (xs - x0)[..., None]; fy = (ys - y0)[..., None]
        img = (base[y0, x0] * (1 - fx) * (1 - fy)
               + base[y0, x0 + 1] * fx * (1 - fy)
               + base[y0 + 1, x0] * (1 - fx) * fy
               + base[y0 + 1, x0 + 1] * fx * fy)
        write_image(seq_dir / f"out_{sf}_{sub:03d}.png", img)

    cfg = tmp_path / "sf.cfg"
    # start 491 subframe 38 -> sintel id 491000 + 38 after *1000 shift...
    # `start` is given as the sintel frame (491); with subframes disabled the
    # CLI scales it to 491000 and the window spans the 42-frame wrap
    cfg.write_text(textwrap.dedent(f"""\
    file\t{seq_dir}/out_%i_%03i.png
    output\t{tmp_path}/sf_out
    Jets\t2
    start\t491
    sintel\t1
    max_fps\t40
    ref_fps\t20
    jet_fps\t40
    adaptive\t0
    16bit\t0
    raw\t0
    scale\t1.0
    deep_matching\t0
    slow_flow_S\t2
    slow_flow_layers\t2
    slow_flow_p_scale\t0.8
    slow_flow_occlusion_reasoning\t0
    slow_flow_niter_alter\t1
    slow_flow_niter_outer\t4
    slow_flow_niter_solver\t20
    """))
    rc = main([str(cfg), "-batch", "2"])
    assert rc == 0

    out = tmp_path / "sf_out"
    # sintel .flo names carry the raw id with subframe 0
    # (slow_flow.cpp:790-791: sprintf(fmt, start + f*skip, 0))
    flo = out / "out_491000_000.flo"
    assert flo.exists(), sorted(p.name for p in out.iterdir())
    flow = read_flo(flo)
    inner = (slice(8, -8), slice(8, -8))
    # frame ids 491000.. map onto our synthetic index f: start offset -1 read
    err = np.hypot(flow[inner][..., 0] - U, flow[inner][..., 1] - V)
    assert err.mean() < 0.4, err.mean()
