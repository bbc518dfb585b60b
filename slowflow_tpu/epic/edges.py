"""Edge cost maps for the geodesic interpolation.

The reference shells out to a MATLAB structured-edge detector (SED) whose
trained model is a missing large blob (matlab/detect_edges.m, invoked at
slow_flow.cpp:747); the framework both *ingests* SED-format binary edge files
(slowflow_tpu.io.edges) for parity, and provides a built-in detector: a
multi-scale color-gradient magnitude with non-linear normalization, producing
the same float32 H x W cost-map contract in [0, 1].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.conv import DERIV_3PT, conv_horiz, conv_vert, gaussian_blur


@partial(jax.jit, static_argnames=())
def detect_edges(im: jnp.ndarray) -> jnp.ndarray:
    """Edge strength in [0, 1] from a [3, H, W] image (0..255).

    Multi-scale color gradient magnitude: |grad| at sigma in {1, 2, 4},
    averaged, then normalized by a soft maximum so typical output levels match
    SED's probability-like range.
    """
    im = im / 255.0
    total = 0.0
    for sigma in (1.0, 2.0, 4.0):
        sm = gaussian_blur(im, sigma)
        gx = conv_horiz(sm, DERIV_3PT)
        gy = conv_vert(sm, DERIV_3PT)
        mag = jnp.sqrt((gx * gx + gy * gy).sum(0))
        total = total + mag * sigma  # larger scales see larger steps
    total = total / 3.0
    # soft normalization: tanh squashes to [0, 1) with gain on weak edges
    return jnp.tanh(4.0 * total)
