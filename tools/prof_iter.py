"""Profile one outer iteration's components on the live chip."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slowflow_tpu.variational.multiframe import (
    MultiFrameParams, get_derivatives_mt, add_data_terms,
    compute_smoothness_mt, compute_dpsis_weight_mt, sub_laplacian,
    occlusion_data_costs, solve_binary_potts, compute_one_level)
from slowflow_tpu.core.solver import sor_coupled_rb
from slowflow_tpu.core.penalty import make_penalty

H, W, REF = 270, 480, 2
F = 2 * REF + 1
p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                     rho=(1.0, 1.0), omega=(0.0, 2.0),
                     layers=5, p_scale=0.9,
                     niter_alter=10, niter_outer=10, niter_inner=1,
                     niter_solver=30, occlusion_reasoning=True, smoothing=1)

rng = np.random.default_rng(0)
seq = jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255.0
wx = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
wy = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
cw = jnp.ones((3, H, W), jnp.float32)
succ, to_ref, mask = get_derivatives_mt(seq, wx, wy, REF)
succ = jax.tree_util.tree_map(jax.block_until_ready, succ)
plane = jnp.asarray(rng.random((H, W)), jnp.float32)
reg_pen = make_penalty(1, 0.001, 0.5)


def timed(fn, n, *args):
    @partial(jax.jit, static_argnames="n")
    def run(a, n):
        def body(i, c):
            out = fn(*jax.tree_util.tree_map(lambda x: x + c * 1e-20, a))
            leaves = jax.tree_util.tree_leaves(out)
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(run(args, 1))
    float(run(args, n))
    t0 = time.perf_counter(); float(run(args, 1)); t1 = time.perf_counter()
    float(run(args, n)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n - 1)


def f_data(du, dv, mask, cw, *planes):
    sd = dict(zip(["ix", "iy", "iz", "ixx", "ixy", "iyy", "ixz", "iyz"],
                  planes[:8]))
    rd = dict(zip(["ix", "iy", "iz", "ixx", "ixy", "iyy", "ixz", "iyz"],
                  planes[8:]))
    return add_data_terms(du, dv, mask, sd, rd, cw, p)


def f_smooth(uu, vv, dw):
    return compute_smoothness_mt(uu, vv, dw, p.alpha, reg_pen, p.smoothing)


def f_sor(du, dv, a11, a12, a22, b1, b2, wh, wv):
    return sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                          iterations=30, omega=1.9)


def f_sor_pallas(du, dv, a11, a12, a22, b1, b2, wh, wv):
    from slowflow_tpu.core.solver_pallas import sor_coupled_rb_pallas
    return sor_coupled_rb_pallas(du, dv, a11, a12, a22, b1, b2, wh, wv,
                                 iterations=30, omega=1.9)


def f_icm(mask, *planes):
    sd = dict(zip(["ix", "iy", "iz", "ixx", "ixy", "iyy", "ixz", "iyz"],
                  planes[:8]))
    rd = dict(zip(["ix", "iy", "iz", "ixx", "ixy", "iyy", "ixz", "iyz"],
                  planes[8:]))
    e0, e1 = occlusion_data_costs(mask, sd, rd, p)
    return solve_binary_potts(e0, e1, p.occlusion_alpha, p.niter_graphc)


def f_level(wx, wy, seq, cw):
    return compute_one_level(wx, wy, seq, cw, jnp.zeros(3), jnp.ones(3), p=p)


keys = ["ix", "iy", "iz", "ixx", "ixy", "iyy", "ixz", "iyz"]
planes = [succ[k] for k in keys] + [to_ref[k] for k in keys]
du = jnp.zeros((H, W)); dv = jnp.zeros((H, W))
a = jnp.ones((H, W)); b = plane * 0.1
wh = plane * 0.5; wv = plane * 0.4

N = 30
print("data terms   :", timed(f_data, N, du, dv, mask, cw, *planes) * 1e3, "ms")
print("smoothness   :", timed(f_smooth, N, wx, wy, plane) * 1e3, "ms")
print("sor 30 (xla) :", timed(f_sor, N, du, dv, a, b, a, b, b, wh, wv) * 1e3, "ms")
try:
    print("sor 30 (plls):",
          timed(f_sor_pallas, N, du, dv, a, b, a, b, b, wh, wv) * 1e3, "ms")
except Exception as e:
    print("sor pallas failed:", repr(e)[:200])
print("occ ICM      :", timed(f_icm, 10, mask, *planes) * 1e3, "ms")
