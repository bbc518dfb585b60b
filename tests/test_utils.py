import numpy as np

from slowflow_tpu.utils.colorwheel import flow_color_img, compute_color
from slowflow_tpu.utils.demosaic import (
    bayer2rgb, bayer2rgb_green_ratio, raw_weighting,
)
from slowflow_tpu.utils.metrics import compute_epe, compute_aae, compute_rms
from slowflow_tpu.io.flo import UNKNOWN_FLOW


def test_colorwheel_properties():
    # zero flow -> white (center of the wheel)
    px = compute_color(np.zeros(1), np.zeros(1))
    assert (px[0] == 255).all()
    # unit vectors map to saturated distinct hues
    a = compute_color(np.array([1.0]), np.array([0.0]))
    b = compute_color(np.array([-1.0]), np.array([0.0]))
    c = compute_color(np.array([0.0]), np.array([1.0]))
    assert not (a == b).all() and not (a == c).all()


def test_flow_color_img_invalid_black():
    u = np.ones((4, 4)); v = np.ones((4, 4))
    u[0, 0] = np.nan
    u[1, 1] = 1e5  # exceeds image size -> invalid
    img = flow_color_img(u, v)
    assert (img[0, 0] == 0).all()
    assert (img[1, 1] == 0).all()
    assert img.shape == (4, 4, 3)
    assert (img[2, 2] != 0).any()


def _bayer_from_rgb(rgb, red_x, red_y):
    h, w, _ = rgb.shape
    yy, xx = np.mgrid[0:h, 0:w]
    blue_row = (yy + (1 - red_y)) % 2 == 0
    out = np.zeros((h, w), np.float32)
    g_in_blue = blue_row & ((xx + red_x) % 2 == 0)
    b_site = blue_row & ~g_in_blue
    g_in_red = ~blue_row & ((xx + (1 - red_x)) % 2 == 0)
    r_site = ~blue_row & ~g_in_red
    out[g_in_blue | g_in_red] = rgb[..., 1][g_in_blue | g_in_red]
    out[b_site] = rgb[..., 2][b_site]
    out[r_site] = rgb[..., 0][r_site]
    return out


def test_demosaic_recovers_constant_image():
    rgb = np.zeros((12, 16, 3), np.float32)
    rgb[..., 0] = 120.0
    rgb[..., 1] = 80.0
    rgb[..., 2] = 200.0
    bayer = _bayer_from_rgb(rgb, red_x=1, red_y=0)
    out = bayer2rgb(bayer, 1, 0)
    np.testing.assert_allclose(out, rgb, atol=1e-4)
    out_gr = bayer2rgb_green_ratio(bayer, 1, 0)
    np.testing.assert_allclose(out_gr, rgb, atol=1e-3)


def test_demosaic_smooth_gradient():
    h, w = 16, 20
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([50 + 2.0 * xx, 80 + 1.0 * yy, 90 + 0.5 * xx],
                   -1).astype(np.float32)
    bayer = _bayer_from_rgb(rgb, 1, 0)
    out = bayer2rgb(bayer, 1, 0)
    # interior within interpolation error of the linear ramp
    assert np.abs(out[2:-2, 2:-2] - rgb[2:-2, 2:-2]).max() < 3.0


def test_raw_weighting_pattern():
    # weight=1.0 is the uniform default (0.5*(3-1) == 1.0 everywhere)
    uniform = raw_weighting(4, 4, red_x=1, red_y=0, weight=1.0)
    np.testing.assert_allclose(uniform, 1.0)
    wts = raw_weighting(4, 4, red_x=1, red_y=0, weight=2.0)
    assert wts.shape == (3, 4, 4)
    np.testing.assert_allclose(wts.sum(0), 3.0)  # weights sum to 3
    # every pixel has exactly one channel with the sampled weight
    assert ((wts == 2.0).sum(0) == 1).all()


def test_metrics():
    gt = np.zeros((5, 5, 2)); gt[..., 0] = 1.0
    flow = gt.copy(); flow[..., 0] = 1.5
    assert abs(compute_epe(flow, gt) - 0.5) < 1e-6
    assert compute_aae(gt, gt) < 1e-6
    # unknown flow is masked out
    flow2 = gt.copy(); flow2[0, 0] = UNKNOWN_FLOW
    assert abs(compute_epe(flow2, gt)) < 1e-6
    im1 = np.zeros((3, 4, 4)); im2 = np.ones((3, 4, 4))
    assert abs(compute_rms(im1, im2) - np.sqrt(3)) < 1e-6


def test_epicflow_cli(tmp_path, rng):
    """Standalone epicflow binary contract (epicflow.cpp)."""
    from slowflow_tpu.cli.epicflow import main
    from slowflow_tpu.io import read_flo
    from slowflow_tpu.io.images import write_image

    h, w = 40, 48
    base = rng.random((h + 10, w + 10, 3)) * 255
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax, base)
    im1 = base[4:4 + h, 4:4 + w]
    im2 = base[4:4 + h, 3:3 + w]  # shift by +1 px in x
    p1 = tmp_path / "a.png"; p2 = tmp_path / "b.png"
    write_image(p1, im1)
    write_image(p2, im2)
    out = tmp_path / "out.flo"
    rc = main([str(p1), str(p2), "auto", "auto", str(out), "-sintel"])
    assert rc == 0
    flow = read_flo(out)
    assert flow.shape == (h, w, 2)
    inner = (slice(10, -10), slice(10, -10))
    err = np.hypot(flow[inner][..., 0] - 1.0, flow[inner][..., 1])
    assert err.mean() < 0.4, err.mean()


def test_epicflow_preset_parity():
    """Preset constants match epicflow.cpp:86-115 exactly (the -kitti preset
    shares the sintel EPIC parameters in the reference too)."""
    from slowflow_tpu.epic import EpicParams
    from slowflow_tpu.variational import TwoFrameParams

    e = EpicParams.sintel()
    assert (e.pref_nn, e.nn, e.coef_kernel) == (25, 160, 1.1)
    s = TwoFrameParams.sintel()
    assert (s.alpha, s.gamma, s.delta, s.sigma, s.niter_outer) == \
        (1.0, 0.72, 0.0, 1.1, 5)
    k = TwoFrameParams.kitti()
    assert (k.alpha, k.gamma, k.delta, k.sigma, k.niter_outer) == \
        (1.0, 0.77, 0.0, 1.7, 2)
    m = TwoFrameParams.middlebury()
    assert (m.alpha, m.gamma, m.delta, m.sigma, m.niter_outer) == \
        (1.0, 0.72, 0.0, 1.1, 25)


def test_hamilton_adams_demosaic():
    """HA is exact on constants and linear ramps (2nd-order corrected) and
    beats plain bilinear on channel-correlated textures."""
    from slowflow_tpu.utils.demosaic import (
        _pattern_masks, bayer2rgb_hamilton_adams)

    h, w = 64, 80
    const = np.full((h, w), 77.0, np.float32)
    out = bayer2rgb_hamilton_adams(const, 1, 0)
    np.testing.assert_allclose(out, 77.0)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = 2 * xx + 3 * yy + 5
    out = bayer2rgb_hamilton_adams(ramp, 0, 0)
    inner = (slice(4, -4), slice(4, -4))
    np.testing.assert_allclose(
        out[inner], np.repeat(ramp[inner][..., None], 3, -1), atol=1e-4)

    rng = np.random.default_rng(0)
    lum = rng.random((h, w)).astype(np.float32) * 255
    for _ in range(2):
        lum = 0.25 * (np.roll(lum, 1, 0) + np.roll(lum, -1, 0)
                      + np.roll(lum, 1, 1) + np.roll(lum, -1, 1))
    R, G, B = 0.9 * lum + 10, lum, 0.8 * lum + 20
    _, b_site, _, r_site = _pattern_masks(h, w, 1, 0)
    mosaic = np.where(r_site, R, np.where(b_site, B, G)).astype(np.float32)
    ha = bayer2rgb_hamilton_adams(mosaic, 1, 0)
    bl = bayer2rgb(mosaic, 1, 0)

    def err(o):
        e = np.stack([np.abs(o[..., 0] - R), np.abs(o[..., 1] - G),
                      np.abs(o[..., 2] - B)])
        return e[(slice(None),) + inner].mean()

    assert err(ha) < err(bl)
