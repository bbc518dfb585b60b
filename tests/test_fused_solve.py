"""The fused smoothness+laplacian+SOR solve step must match the XLA path.

The kernel (variational/fused_solve.py) re-derives, inside one Pallas
program, exactly what the XLA inner body composes from compute_smoothness_mt
+ 2x sub_laplacian + sor_coupled_rb (variational_aux_mt.cpp:18-161 +
solver.c:17-57 semantics). Interpret mode on CPU; formulas are shared, so
agreement must be near-bitwise (f32 reassociation only).
"""
import numpy as np
import jax.numpy as jnp
import pytest

# The whole module compiles large Pallas-interpret XLA:CPU executables: the
# persistent compilation cache crashes natively on this class on BOTH the
# write (zstd serialize) and read (deserialize) paths — keep it off here
# (see conftest._nocache_compilation).
pytestmark = [pytest.mark.nocache, pytest.mark.slow]


from slowflow_tpu.core.penalty import make_penalty
from slowflow_tpu.core.solver import sor_coupled_rb
from slowflow_tpu.variational.multiframe import (
    compute_smoothness_mt, sub_laplacian)
from slowflow_tpu.variational.fused_solve import (
    fused_solve_step, fused_solve_step_batched)


def _xla_solve_step(uu, vv, dpsis, a11, a12, a22, b1, b2, du, dv, *,
                    alpha, reg_pen, method, iterations, omega):
    wh, wv = compute_smoothness_mt(uu, vv, dpsis, alpha, reg_pen, method)
    b1 = sub_laplacian(b1, uu, wh, wv)
    b2 = sub_laplacian(b2, vv, wh, wv)
    return sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                          iterations=iterations, omega=omega)


def _args(rng, h, w):
    return dict(
        uu=jnp.asarray(rng.normal(size=(h, w)).astype(np.float32)),
        vv=jnp.asarray(rng.normal(size=(h, w)).astype(np.float32)),
        dpsis=jnp.asarray(rng.random((h, w)).astype(np.float32) * 0.5),
        a11=jnp.asarray(rng.random((h, w)).astype(np.float32) + 1),
        a12=jnp.asarray((rng.random((h, w)).astype(np.float32) - 0.5) * 0.3),
        a22=jnp.asarray(rng.random((h, w)).astype(np.float32) + 1),
        b1=jnp.asarray(rng.normal(size=(h, w)).astype(np.float32)),
        b2=jnp.asarray(rng.normal(size=(h, w)).astype(np.float32)),
        du=jnp.zeros((h, w), jnp.float32),
        dv=jnp.zeros((h, w), jnp.float32),
    )


@pytest.mark.parametrize("method", [0, 1, 2])
def test_fused_solve_matches_xla(rng, method):
    h, w = 14, 18
    args = _args(rng, h, w)
    kw = dict(alpha=4.0, reg_pen=make_penalty(1, 0.001, 0.5), method=method,
              iterations=7, omega=1.9)
    ref_du, ref_dv = _xla_solve_step(**args, **kw)
    got_du, got_dv = fused_solve_step(**args, **kw, interpret=True)
    np.testing.assert_allclose(got_du, ref_du, rtol=0, atol=2e-5)
    np.testing.assert_allclose(got_dv, ref_dv, rtol=0, atol=2e-5)


def test_fused_solve_nonzero_init_and_trunc_penalty(rng):
    h, w = 12, 16
    args = _args(rng, h, w)
    args["du"] = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * 0.1)
    args["dv"] = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * 0.1)
    kw = dict(alpha=2.0, reg_pen=make_penalty(3, 0.001, 0.5), method=1,
              iterations=5, omega=1.9)
    ref = _xla_solve_step(**args, **kw)
    got = fused_solve_step(**args, **kw, interpret=True)
    np.testing.assert_allclose(got[0], ref[0], rtol=0, atol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=0, atol=2e-5)


def test_fused_solve_zero_init_drops_operands(rng):
    """Omitting du/dv (the production niter_inner==1 form — zeros
    materialized in-kernel) must equal the explicit-zeros call exactly."""
    h, w = 14, 18
    args = _args(rng, h, w)
    kw = dict(alpha=4.0, reg_pen=make_penalty(1, 0.001, 0.5), method=1,
              iterations=6, omega=1.9)
    explicit = fused_solve_step(**args, **kw, interpret=True)
    del args["du"], args["dv"]
    dropped = fused_solve_step(**args, **kw, interpret=True)
    np.testing.assert_array_equal(dropped[0], explicit[0])
    np.testing.assert_array_equal(dropped[1], explicit[1])


def test_fused_solve_with_change_sums(rng):
    """The in-kernel (sum|du|, sum|dv|) reduction must equal the host-side
    reduction of the returned planes."""
    h, w = 12, 16
    args = _args(rng, h, w)
    del args["du"], args["dv"]
    kw = dict(alpha=4.0, reg_pen=make_penalty(1, 0.001, 0.5), method=1,
              iterations=5, omega=1.9)
    ndu, ndv, s = fused_solve_step(**args, **kw, interpret=True,
                                   with_change=True)
    np.testing.assert_allclose(float(s[0]), np.abs(np.asarray(ndu)).sum(),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s[1]), np.abs(np.asarray(ndv)).sum(),
                               rtol=1e-6)


@pytest.mark.parametrize("zero", [True, False])
def test_fused_solve_packed_rb_matches_masked(rng, zero):
    """Checkerboard-packed sweeps reproduce the masked red-black path to
    FMA-contraction noise (same per-cell expressions and color order; the
    compiler fuses multiply-adds differently across the two expression
    trees — measured max 6e-7 over 6 sweeps)."""
    h, w = 16, 20
    args = _args(rng, h, w)
    if zero:
        del args["du"], args["dv"]
    else:
        args["du"] = jnp.asarray(
            rng.normal(size=(h, w)).astype(np.float32) * 0.1)
        args["dv"] = jnp.asarray(
            rng.normal(size=(h, w)).astype(np.float32) * 0.1)
    kw = dict(alpha=4.0, reg_pen=make_penalty(1, 0.001, 0.5), method=1,
              iterations=6, omega=1.9)
    base = fused_solve_step(**args, **kw, interpret=True)
    packed = fused_solve_step(**args, **kw, interpret=True, packed_rb=True)
    np.testing.assert_allclose(packed[0], base[0], rtol=0, atol=1e-5)
    np.testing.assert_allclose(packed[1], base[1], rtol=0, atol=1e-5)


def test_fused_solve_batched_matches_per_jet(rng):
    h, w, b = 10, 14, 3
    per = [_args(rng, h, w) for _ in range(b)]
    kw = dict(alpha=4.0, reg_pen=make_penalty(1, 0.001, 0.5), method=1,
              iterations=4, omega=1.9)
    stacked = {k: jnp.stack([p[k] for p in per]) for k in per[0]}
    got = fused_solve_step_batched(*stacked.values(), **kw, interpret=True)
    for i in range(b):
        ref = fused_solve_step(*per[i].values(), **kw, interpret=True)
        np.testing.assert_array_equal(got[0][i], ref[0])
        np.testing.assert_array_equal(got[1][i], ref[1])


def test_solve_route_in_full_pipeline(rng):
    """variational_mt with fused_solve=True must match the default route."""
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, variational_mt)
    from dataclasses import replace

    h, w = 24, 32
    f = 3
    seq = jnp.asarray(rng.random((f, 3, h, w)).astype(np.float32))
    p = MultiFrameParams(S=2, layers=2, niter_alter=2, niter_outer=3,
                         niter_solver=6, merge_warp=False)
    wx = jnp.zeros((h, w), jnp.float32)
    base = variational_mt(wx, wx, seq, p)
    fused = variational_mt(wx, wx, seq, replace(p, fused_solve=True))
    np.testing.assert_allclose(fused[0], base[0], rtol=0, atol=1e-4)
    np.testing.assert_allclose(fused[1], base[1], rtol=0, atol=1e-4)


def test_vmap_budget_fallback_equivalence():
    """Above the scoped-VMEM budget (while-loop operand residency, ~10
    [B,H,W] planes vs ~18 MB) the custom_vmap rule must take the composed
    XLA path and agree with the per-item kernel — the production OOM this
    guards was hit on chip at b=4, 480x270 (jet_vmap stage-2 run, r5) and
    would equally hit any shard_map local batch > 1 at working resolution."""
    import jax

    from slowflow_tpu.variational.multiframe import (MultiFrameParams,
                                                     _fused_solve_cv)

    p = MultiFrameParams(S=3, rho=(1.0, 1.0), omega=(0.0, 2.0),
                         niter_solver=8, occlusion_reasoning=True,
                         smoothing=1)
    rng = np.random.default_rng(0)
    B, h, w = 32, 64, 180       # 32*64*180*40 = 14.7 MB > budget

    def mk(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    uu, vv, dpsis = mk(B, h, w), mk(B, h, w), jnp.abs(mk(B, h, w))
    a11 = jnp.abs(mk(B, h, w)) + 1.0
    a22 = jnp.abs(mk(B, h, w)) + 1.0
    a12 = 0.1 * mk(B, h, w)
    b1, b2 = mk(B, h, w), mk(B, h, w)
    fn = _fused_solve_cv(p, True, zero_init=True, with_change=True)
    outs = jax.vmap(fn)(uu, vv, dpsis, a11, a12, a22, b1, b2)
    for i in (0, 1, B - 1):
        ref = fn(*[a[i] for a in (uu, vv, dpsis, a11, a12, a22, b1, b2)])
        for k in (0, 1):
            np.testing.assert_allclose(np.asarray(outs[k][i]),
                                       np.asarray(ref[k]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(outs[2][i]),
                                   np.asarray(ref[2]), rtol=1e-5)
