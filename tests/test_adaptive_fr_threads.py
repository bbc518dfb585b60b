"""adaptiveFR with -threads N over multiple sequence folders must match the
serial run (reference analogue: OpenMP over folders, adaptiveFR.cpp:245)."""
import numpy as np
import pytest

from slowflow_tpu.io.images import write_image

H, W, N_FRAMES = 48, 64, 9


def _make_root(tmp, name):
    root = tmp / name
    root.mkdir()
    for fi, (u, v, seed) in enumerate(((1.0, 0.5, 3), (0.5, -0.8, 4))):
        rng = np.random.default_rng(seed)
        pad = 24
        base = rng.random((H + 2 * pad, W + 2 * pad, 3)) * 255
        k = np.ones(5) / 5
        for ax in (0, 1):
            base = np.apply_along_axis(
                lambda r: np.convolve(r, k, "same"), ax, base)
        base = (base - base.min()) / (base.max() - base.min()) * 255
        seq = root / f"seq{fi}"
        seq.mkdir()
        yy, xx = np.mgrid[0:H, 0:W]
        for f in range(N_FRAMES):
            xs = xx + pad - f * u
            ys = yy + pad - f * v
            x0 = np.floor(xs).astype(int)
            y0 = np.floor(ys).astype(int)
            fx = (xs - x0)[..., None]
            fy = (ys - y0)[..., None]
            img = (base[y0, x0] * (1 - fx) * (1 - fy)
                   + base[y0, x0 + 1] * fx * (1 - fy)
                   + base[y0 + 1, x0] * (1 - fx) * fy
                   + base[y0 + 1, x0 + 1] * fx * fy)
            write_image(seq / f"frame_{f:03d}.png", img)
    return root


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("afr_threads")
    return _make_root(tmp, "serial"), _make_root(tmp, "threaded")


def test_threads_matches_serial(roots):
    from slowflow_tpu.cli.adaptive_fr import main

    serial, threaded = roots
    base_args = ["-format", "frame_%03i.png", "-scale", "0.5", "-skip", "2",
                 "-samples", "2", "-step", "2", "-start", "0"]
    assert main(["-path", str(serial)] + base_args) == 0
    assert main(["-path", str(threaded)] + base_args
                + ["-threads", "2"]) == 0

    for fi in range(2):
        q_s = (serial / f"seq{fi}" / "quantil.dat").read_text()
        q_t = (threaded / f"seq{fi}" / "quantil.dat").read_text()
        assert q_s == q_t, (fi, q_s, q_t)
    # results.info rows keep folder order in both modes
    rows_s = (serial / "results.info").read_text().splitlines()
    rows_t = (threaded / "results.info").read_text().splitlines()
    assert rows_s == rows_t
