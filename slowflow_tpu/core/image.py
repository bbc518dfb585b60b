"""Image-space operations: Lab conversion, saliency, luminance, rescaling.

Color images are channel-planar float32 arrays [3, H, W] (matching the
reference's planar color_image_t layout, epic_flow_extended/image.h:44-52)
but without stride padding — XLA owns the memory layout.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .conv import DERIV_3PT, conv_sep, conv_horiz, conv_vert, gaussian_kernel


@jax.jit
def rgb_to_lab(im: jnp.ndarray) -> jnp.ndarray:
    """RGB [3, H, W] in 0..255 -> attenuated L*a*b* (image.c:694-726).

    Dark/light areas get attenuated a/b channels via
    exp(-1.5 * ((L/100)^2 - 0.6)^2) — the reference's `correct_lab`.
    """
    r, g, b = im[0] / 255.0, im[1] / 255.0, im[2] / 255.0
    T = 0.008856
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    X = X / 0.950456
    Z = Z / 1.088754
    Y3 = jnp.cbrt(jnp.maximum(Y, 0.0))
    fX = jnp.where(X > T, jnp.cbrt(jnp.maximum(X, 0.0)), 7.787 * X + 16.0 / 116.0)
    fY = jnp.where(Y > T, Y3, 7.787 * Y + 16.0 / 116.0)
    fZ = jnp.where(Z > T, jnp.cbrt(jnp.maximum(Z, 0.0)), 7.787 * Z + 16.0 / 116.0)
    L = jnp.where(Y > T, 116.0 * Y3 - 16.0, 903.3 * Y)
    A = 500.0 * (fX - fY)
    B = 200.0 * (fY - fZ)
    correct = jnp.exp(-1.5 * ((L / 100.0) ** 2 - 0.6) ** 2)
    return jnp.stack([L, A * correct, B * correct])


def luminance(im: jnp.ndarray, scale: float = 255.0) -> jnp.ndarray:
    """0.299 R + 0.587 G + 0.114 B, normalized by `scale`."""
    return (0.299 * im[0] + 0.587 * im[1] + 0.114 * im[2]) / scale


@partial(jax.jit, static_argnames=("sigma_image", "sigma_matrix"))
def saliency(im: jnp.ndarray, sigma_image: float = 0.8,
             sigma_matrix: float = 1.0) -> jnp.ndarray:
    """Min-eigenvalue-of-structure-tensor saliency (image.c:729-790)."""
    k_img = gaussian_kernel(sigma_image)
    sim = conv_sep(im, k_img, k_img)
    imx = conv_horiz(sim, DERIV_3PT)
    imy = conv_vert(sim, DERIV_3PT)
    ixx = (imx * imx).sum(axis=0)
    ixy = (imx * imy).sum(axis=0)
    iyy = (imy * imy).sum(axis=0)
    k_mat = gaussian_kernel(sigma_matrix)
    ixx = conv_sep(ixx, k_mat, k_mat)
    ixy = conv_sep(ixy, k_mat, k_mat)
    iyy = conv_sep(iyy, k_mat, k_mat)
    tr = 0.5 * (ixx + iyy)
    disc = jnp.sqrt(jnp.maximum(0.0, tr * tr + ixy * ixy - ixx * iyy))
    return jnp.sqrt(jnp.maximum(0.0, tr - disc))


def resize_bilinear(x: jnp.ndarray, new_h: int, new_w: int,
                    align_opencv: bool = True) -> jnp.ndarray:
    """Bilinear resize on the trailing [H, W] axes.

    With align_opencv=True, sample coordinates follow OpenCV's INTER_LINEAR
    convention (pixel-centre alignment: src = (dst + 0.5) * scale - 0.5), which
    the reference uses for pyramid construction and flow upscaling
    (variational_mt.cpp:611, 672-712). jax.image.resize('linear') implements
    the same convention.
    """
    out_shape = x.shape[:-2] + (new_h, new_w)
    return jax.image.resize(x, out_shape, method="linear")


def rescale_flow(wx: jnp.ndarray, wy: jnp.ndarray, new_h: int, new_w: int):
    """Resize a flow field and scale the vectors by the size ratio
    (variational_mt.cpp:702-717)."""
    fh = new_h / wx.shape[-2]
    fw = new_w / wx.shape[-1]
    wx2 = resize_bilinear(wx, new_h, new_w) * fw
    wy2 = resize_bilinear(wy, new_h, new_w) * fh
    return wx2, wy2


def pyramid_sizes(h: int, w: int, layers: int, p_scale: float,
                  min_size: int | None = None) -> list[tuple[int, int]]:
    """Per-layer (H, W), layer 0 = full resolution.

    Layer l has floor(size_{l-1} * p_scale) (variational_mt.cpp:609-610).
    Construction stops early when the next layer would be smaller than
    `min_size` (default: presmoothing order + 1, variational_mt.cpp:647-651).
    """
    sigma = 1.0 / math.sqrt(2.0 * p_scale)
    order = max(int(math.floor(3 * sigma)) + 1, 1)
    if min_size is None:
        min_size = order + 1
    sizes = [(h, w)]
    for _ in range(1, layers):
        ph, pw = sizes[-1]
        nh, nw = int(math.floor(ph * p_scale)), int(math.floor(pw * p_scale))
        if nh <= min_size or nw <= min_size:
            break
        sizes.append((nh, nw))
    return sizes


def build_pyramid(seq: jnp.ndarray, sizes: list[tuple[int, int]],
                  p_scale: float, sigma0: float = 0.0) -> list[jnp.ndarray]:
    """Gaussian pyramid of an image stack [..., 3, H, W].

    Layer 0 is the (optionally presmoothed) input; layer l is layer l-1
    blurred with sigma = 1/sqrt(2*p_scale) and bilinearly resized
    (variational_mt.cpp:578-615).
    """
    from .conv import gaussian_blur

    out = []
    cur = seq
    if sigma0 > 0:
        cur = gaussian_blur(cur, sigma0)
    out.append(cur)
    sigma = 1.0 / math.sqrt(2.0 * p_scale)
    for (nh, nw) in sizes[1:]:
        cur = gaussian_blur(cur, sigma)
        cur = resize_bilinear(cur, nh, nw)
        out.append(cur)
    return out


def normalize_sequence(seq: np.ndarray):
    """Standardize an image sequence to zero mean / unit(255) std per channel.

    Matches `normalize` (variational_mt.cpp:17-85): statistics are averaged
    over frames; std is divided by 255 so intensities end up with std 255.
    seq is [F, 3, H, W]. Returns (normalized, avg[3], std[3]).
    """
    seq = np.asarray(seq, np.float64)
    avg = seq.mean(axis=(0, 2, 3))
    second = (seq * seq).mean(axis=(0, 2, 3))
    std = np.sqrt(second - avg * avg) / 255.0
    out = seq.copy()
    for c in range(seq.shape[1]):
        if std[c] > 0:
            out[:, c] = (seq[:, c] - avg[c]) / std[c]
    return out.astype(np.float32), avg, std
