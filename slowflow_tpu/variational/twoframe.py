"""Two-frame variational refinement (original EpicFlow v1.00 energy).

Re-implementation of epic_flow_extended/variational.c + variational_aux.c as a
single jittable JAX function. The energy is the classic Brox-style model:
color/gradient constancy data terms with per-term normalization, edge-weighted
TV-like smoothness, solved by IRLS with a coupled SOR linear solve.

All arrays are float32; images are planar [3, H, W].
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.conv import DERIV_5PT, DERIV_3PT, conv_horiz, conv_vert, conv_sep
from ..core.solver import sor_coupled_rb
from ..core.warp import warp_bilinear

# constants from variational_aux.c:10-13
DATANORM = 0.1 * 0.1
EPS_COLOR = 0.001 * 0.001
EPS_GRAD = 0.001 * 0.001
EPS_SMOOTH = 0.001 * 0.001


@dataclass(frozen=True)
class TwoFrameParams:
    """variational_params_t with the reference defaults (variational.c:85-98)."""

    alpha: float = 1.0
    gamma: float = 0.71
    delta: float = 0.0
    sigma: float = 1.0
    niter_outer: int = 5
    niter_inner: int = 1
    niter_solver: int = 30
    sor_omega: float = 1.9

    @classmethod
    def sintel(cls):
        """Sintel preset (epicflow.cpp:91-100, adaptiveFR.cpp:295-302)."""
        return cls(alpha=1.0, gamma=0.72, delta=0.0, sigma=1.1, niter_outer=5)

    @classmethod
    def kitti(cls):
        return cls(alpha=1.0, gamma=0.77, delta=0.0, sigma=1.7, niter_outer=2)

    @classmethod
    def middlebury(cls):
        return cls(alpha=1.0, gamma=0.72, delta=0.0, sigma=1.1, niter_outer=25)


def get_derivatives(im1, w_im2):
    """Spatio-temporal derivatives on mean(im1, warped im2)
    (variational_aux.c:55-78). Both [3, H, W]."""
    tmp = 0.5 * (im1 + w_im2)
    iz = w_im2 - im1
    ix = conv_horiz(tmp, DERIV_5PT)
    iy = conv_vert(tmp, DERIV_5PT)
    ixx = conv_horiz(ix, DERIV_5PT)
    ixy = conv_vert(ix, DERIV_5PT)
    iyy = conv_vert(iy, DERIV_5PT)
    ixz = conv_horiz(iz, DERIV_5PT)
    iyz = conv_vert(iz, DERIV_5PT)
    return ix, iy, iz, ixx, ixy, iyy, ixz, iyz


def compute_dpsis_weight(im, coef=5.0):
    """Local smoothness weight 0.5*exp(-coef*|grad(lum)|)
    (variational_aux.c:183-209)."""
    lum = (0.299 * im[0] + 0.587 * im[1] + 0.114 * im[2]) / 255.0
    lx = conv_horiz(lum, DERIV_5PT)
    ly = conv_vert(lum, DERIV_5PT)
    return 0.5 * jnp.exp(-coef * jnp.sqrt(lx * lx + ly * ly))


def compute_smoothness(uu, vv, dpsis_weight, half_alpha):
    """Edge- and flow-gradient-weighted smoothness coefficients
    (variational_aux.c:84-149). Returns (wh, wv) with wh[:, -1] = wv[-1, :] = 0."""
    ux1 = jnp.pad(uu[:, 1:] - uu[:, :-1], ((0, 0), (0, 1)))
    vx1 = jnp.pad(vv[:, 1:] - vv[:, :-1], ((0, 0), (0, 1)))
    uy1 = jnp.pad(uu[1:] - uu[:-1], ((0, 1), (0, 0)))
    vy1 = jnp.pad(vv[1:] - vv[:-1], ((0, 1), (0, 0)))
    ux2 = conv_horiz(uu, DERIV_3PT)
    vx2 = conv_horiz(vv, DERIV_3PT)
    uy2 = conv_vert(uu, DERIV_3PT)
    vy2 = conv_vert(vv, DERIV_3PT)

    def east(x):
        return jnp.pad(x[:, 1:], ((0, 0), (0, 1)), mode="edge")

    def south(x):
        return jnp.pad(x[1:], ((0, 1), (0, 0)), mode="edge")

    # horizontal: flow gradient magnitude across edge (i,j)-(i+1,j)
    t_u = 0.5 * (uy2 + east(uy2))
    t_v = 0.5 * (vy2 + east(vy2))
    hsq = ux1 * ux1 + t_u * t_u + vx1 * vx1 + t_v * t_v
    wh = (dpsis_weight + east(dpsis_weight)) * half_alpha / jnp.sqrt(hsq + EPS_SMOOTH)
    wh = wh.at[:, -1].set(0.0)

    t_u = 0.5 * (ux2 + south(ux2))
    t_v = 0.5 * (vx2 + south(vx2))
    vsq = uy1 * uy1 + t_u * t_u + vy1 * vy1 + t_v * t_v
    wv = (dpsis_weight + south(dpsis_weight)) * half_alpha / jnp.sqrt(vsq + EPS_SMOOTH)
    wv = wv.at[-1, :].set(0.0)
    return wh, wv


def sub_laplacian(dst, src, wh, wv):
    """dst += div(w * grad(src)) (variational_aux.c:153-180)."""
    th = wh * (jnp.pad(src[:, 1:], ((0, 0), (0, 1)), mode="edge") - src)
    th = th.at[:, -1].set(0.0)
    dst = dst + th - jnp.pad(th[:, :-1], ((0, 0), (1, 0)))
    tv = wv * (jnp.pad(src[1:], ((0, 1), (0, 0)), mode="edge") - src)
    tv = tv.at[-1, :].set(0.0)
    dst = dst + tv - jnp.pad(tv[:-1], ((1, 0), (0, 0)))
    return dst


def compute_data_and_match(du, dv, mask, derivs, half_delta_over3, half_gamma_over3):
    """IRLS data-term normal equations (variational_aux.c:215-302).

    derivs = (ix, iy, iz, ixx, ixy, iyy, ixz, iyz), each [3, H, W].
    Returns (a11, a12, a22, b1, b2).
    """
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = derivs
    zero = jnp.zeros_like(du)
    a11 = a12 = a22 = b1 = b2 = zero

    if half_delta_over3 != 0.0:
        tmp = iz + ix * du + iy * dv                 # [3, H, W]
        n = ix * ix + iy * iy + DATANORM
        w = mask * half_delta_over3 / jnp.sqrt((tmp * tmp / n).sum(0) + EPS_COLOR)
        coef = w[None] / n
        a11 = a11 + (coef * ix * ix).sum(0)
        a12 = a12 + (coef * ix * iy).sum(0)
        a22 = a22 + (coef * iy * iy).sum(0)
        b1 = b1 - (coef * iz * ix).sum(0)
        b2 = b2 - (coef * iz * iy).sum(0)

    n1 = ixx * ixx + ixy * ixy + DATANORM
    n2 = iyy * iyy + ixy * ixy + DATANORM
    t1 = ixz + ixx * du + ixy * dv
    t2 = iyz + ixy * du + iyy * dv
    w = mask * half_gamma_over3 / jnp.sqrt(
        (t1 * t1 / n1 + t2 * t2 / n2).sum(0) + EPS_GRAD)
    c1 = w[None] / n1
    c2 = w[None] / n2
    a11 = a11 + (c1 * ixx * ixx + c2 * ixy * ixy).sum(0)
    a12 = a12 + (c1 * ixx * ixy + c2 * ixy * iyy).sum(0)
    a22 = a22 + (c2 * iyy * iyy + c1 * ixy * ixy).sum(0)
    b1 = b1 - (c1 * ixx * ixz + c2 * ixy * iyz).sum(0)
    b2 = b2 - (c2 * iyy * iyz + c1 * ixy * ixz).sum(0)
    return a11, a12, a22, b1, b2


@partial(jax.jit, static_argnames=("params",))
def variational_twoframe(wx, wy, im1, im2, params: TwoFrameParams = TwoFrameParams()):
    """Refine flow (wx, wy) between im1 and im2 (variational.c:101-143).

    Single pyramid level, `niter_outer` warping iterations, each with
    `niter_inner` IRLS updates and `niter_solver` SOR iterations.
    """
    half_alpha = 0.5 * params.alpha
    half_gamma_over3 = params.gamma * 0.5 / 3.0
    half_delta_over3 = params.delta * 0.5 / 3.0

    dpsis_weight = compute_dpsis_weight(im1)

    def outer_step(carry, _):
        wx, wy = carry
        w_im2, mask = warp_bilinear(im2, wx, wy)
        derivs = get_derivatives(im1, w_im2)
        du = jnp.zeros_like(wx)
        dv = jnp.zeros_like(wy)
        uu, vv = wx, wy

        def inner_step(carry, _):
            du, dv, uu, vv = carry
            wh, wv = compute_smoothness(uu, vv, dpsis_weight, half_alpha)
            a11, a12, a22, b1, b2 = compute_data_and_match(
                du, dv, mask, derivs, half_delta_over3, half_gamma_over3)
            b1 = sub_laplacian(b1, wx, wh, wv)
            b2 = sub_laplacian(b2, wy, wh, wv)
            du, dv = sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                                    iterations=params.niter_solver,
                                    omega=params.sor_omega)
            return (du, dv, wx + du, wy + dv), None

        (du, dv, uu, vv), _ = jax.lax.scan(
            inner_step, (du, dv, uu, vv), None, length=params.niter_inner)
        return (uu, vv), None

    (wx, wy), _ = jax.lax.scan(outer_step, (wx, wy), None,
                               length=params.niter_outer)
    return wx, wy


@partial(jax.jit, static_argnames=("params",))
def variational_twoframe_batched(wx, wy, im1, im2,
                                 params: TwoFrameParams = TwoFrameParams()):
    """Batched refinement: one dispatch for B independent pairs
    (the vmap replacement for adaptiveFR's OpenMP sample loop,
    adaptiveFR.cpp:245,310-614). wx/wy: [B, H, W]; im1/im2: [B, 3, H, W]."""
    return jax.vmap(partial(variational_twoframe, params=params))(
        wx, wy, im1, im2)
