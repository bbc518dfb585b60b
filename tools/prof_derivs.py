"""Profile the derivative-stack hot path on the live chip.

CSE-proof chained timing (docs/PROFILING.md): wrap the op in a fori_loop
whose carry perturbs the inputs, time N vs 1, divide.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slowflow_tpu.variational.multiframe import get_derivatives_mt
from slowflow_tpu.core.warp import warp_bilinear
from slowflow_tpu.core.warp_pallas import warp_stack_pallas

H, W, REF = 270, 480, 2
F = 2 * REF + 1

rng = np.random.default_rng(0)
seq = jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255.0
wx = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
wy = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
factors = jnp.arange(F, dtype=jnp.float32) - REF


def timed(fn, n, *args):
    @partial(jax.jit, static_argnames="n")
    def run(a, n):
        def body(i, c):
            out = fn(*[x + c * 1e-20 for x in a])
            leaves = jax.tree_util.tree_leaves(out)
            return c + sum(jnp.sum(l) for l in leaves) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(run(args, 1))  # compile+warm both variants
    float(run(args, n))
    t0 = time.perf_counter()
    float(run(args, 1))
    t1 = time.perf_counter()
    float(run(args, n))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n - 1)


def stack_xla(seq, wx, wy):
    outs = [warp_bilinear(seq[k], wx, wy, factor=float(k - REF))[0]
            for k in range(F)]
    return jnp.stack(outs)


def stack_pallas(seq, wx, wy):
    return warp_stack_pallas(seq, wx, wy, factors)[0]


def derivs_full(seq, wx, wy):
    s, r, m = get_derivatives_mt(seq, wx, wy, REF)
    return s["ix"], r["ix"], m


def derivs_full_pallas(seq, wx, wy):
    s, r, m = get_derivatives_mt(seq, wx, wy, REF, pallas_warp=True)
    return s["ix"], r["ix"], m


def stack_shift(seq, wx, wy):
    from slowflow_tpu.core.warp_shift import warp_stack_auto
    return warp_stack_auto(seq, wx, wy, REF)


N = 30
print("shift-warp 5-stack      :", timed(stack_shift, N, seq, wx, wy) * 1e3, "ms")
print("xla banded 5-warp stack :", timed(stack_xla, N, seq, wx, wy) * 1e3, "ms")
print("pallas 5-warp stack     :", timed(stack_pallas, N, seq, wx, wy) * 1e3, "ms")
print("full deriv stack (xla)  :", timed(derivs_full, N, seq, wx, wy) * 1e3, "ms")
print("full deriv stack (palls):", timed(derivs_full_pallas, N, seq, wx, wy) * 1e3, "ms")
