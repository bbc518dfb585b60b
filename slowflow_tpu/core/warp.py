"""Bilinear warping with boundary masks.

Matches `Variational_AUX_MT::image_warp` (variational_aux_mt.cpp:722-756):
sample src at (x + factor*wx, y + factor*wy) with bilinear weights; sample
coordinates are clamped per-corner (RECTIFY); the mask is 1 iff the continuous
coordinate lies inside [0, W-1] x [0, H-1].
"""
from __future__ import annotations

import jax.numpy as jnp


def warp_bilinear(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray,
                  factor: float = 1.0, with_mask: bool = True):
    """Warp `src` [..., H, W] by flow (wx, wy) [H, W] scaled by `factor`.

    Returns (warped, mask) — mask is float32 [H, W] (1 inside, 0 outside),
    or None when with_mask is False.
    """
    h, w = src.shape[-2], src.shape[-1]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=wx.dtype),
                          jnp.arange(w, dtype=wx.dtype), indexing="ij")
    x = xx + factor * wx
    y = yy + factor * wy

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    x1c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x2c = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y2c = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def gather(iy, ix):
        return src[..., iy, ix]

    out = (gather(y1c, x1c) * (1 - dx) * (1 - dy)
           + gather(y1c, x2c) * dx * (1 - dy)
           + gather(y2c, x1c) * (1 - dx) * dy
           + gather(y2c, x2c) * dx * dy)

    if not with_mask:
        return out, None
    mask = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)).astype(src.dtype)
    return out, mask


def warp_image(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray):
    """Two-frame variant (variational_aux.c:18-52): factor fixed to 1."""
    return warp_bilinear(src, wx, wy, factor=1.0, with_mask=True)
