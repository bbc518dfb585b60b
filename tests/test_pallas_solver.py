"""The fused Pallas SOR must match the XLA red-black solver exactly.

Runs in interpreter mode on CPU (the Mosaic TPU path is exercised by the
benchmark); the two implementations share the half-sweep semantics, so they
must agree bit-for-bit at every iteration count.
"""
import numpy as np
import jax.numpy as jnp
import pytest

# The whole module compiles large Pallas-interpret XLA:CPU executables: the
# persistent compilation cache crashes natively on this class on BOTH the
# write (zstd serialize) and read (deserialize) paths — keep it off here
# (see conftest._nocache_compilation).
pytestmark = pytest.mark.nocache


from slowflow_tpu.core.solver import sor_coupled_rb


def _pallas_interpret(args, iterations):
    """Invoke the kernel body through the same math in interpret mode."""
    from functools import partial

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from slowflow_tpu.core import solver_pallas as sp

    du, dv, a11, a12, a22, b1, b2, wh, wv = args
    h, w = du.shape
    wh = wh.at[:, -1].set(0.0)
    wv = wv.at[-1, :].set(0.0)
    w_n = jnp.pad(wv[:-1, :], ((1, 0), (0, 0)))
    w_w = jnp.pad(wh[:, :-1], ((0, 0), (1, 0)))
    sum_w = w_n + w_w + wv + wh
    A11 = a11 + sum_w
    A22 = a22 + sum_w
    det = A11 * A22 - a12 * a12
    det = jnp.where(det == 0, 1.0, det)
    flat = [x.reshape(1, h, w) for x in
            (du, dv, A22 / det, -a12 / det, A11 / det, b1, b2,
             w_n, w_w, wv, wh)]
    kernel = partial(sp._sor_kernel, iterations=iterations, omega=1.9)
    spec = pl.BlockSpec((1, h, w), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel, grid=(1,),
        out_shape=(jax.ShapeDtypeStruct((1, h, w), du.dtype),) * 2,
        in_specs=[spec] * 11, out_specs=(spec, spec),
        interpret=True,
    )(*flat)
    return [o[0] for o in out]


@pytest.mark.parametrize("iterations", [1, 7])
def test_pallas_sor_matches_xla(rng, iterations):
    h, w = 12, 16
    args = [jnp.asarray(a) for a in (
        np.zeros((h, w), np.float32), np.zeros((h, w), np.float32),
        rng.random((h, w)).astype(np.float32) + 1,
        (rng.random((h, w)).astype(np.float32) - 0.5) * 0.3,
        rng.random((h, w)).astype(np.float32) + 1,
        rng.normal(size=(h, w)).astype(np.float32),
        rng.normal(size=(h, w)).astype(np.float32),
        rng.random((h, w)).astype(np.float32) * 0.5,
        rng.random((h, w)).astype(np.float32) * 0.5,
    )]
    got = _pallas_interpret(args, iterations)
    want = sor_coupled_rb(*args, iterations=iterations, omega=1.9)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_pallas_warp_matches_xla(rng):
    """The VMEM one-hot warp kernel must match the reference warp exactly
    (interpret mode on CPU; Mosaic path exercised by the benchmark)."""
    import jax.numpy as jnp

    from slowflow_tpu.core.warp import warp_bilinear
    from slowflow_tpu.core.warp_pallas import warp_stack_pallas

    h, w = 64, 160
    seq = rng.random((3, 3, h, w)).astype(np.float32) * 255
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    wx = jnp.asarray(4.0 + 2 * np.sin(yy / 20))
    wy = jnp.asarray(-2.0 + 1.5 * np.cos(xx / 25))
    factors = np.array([-1.0, 0.0, 1.0], np.float32)

    out, masks = warp_stack_pallas(seq, wx, wy, factors, interpret=True)
    for f in range(3):
        want, wmask = warp_bilinear(jnp.asarray(seq[f]), wx, wy,
                                    factor=float(factors[f]), banded=False)
        # Precision.HIGH (bf16x3) contract on 0-255 images: newer XLA CPU
        # no longer evaluates HIGH one-hot contractions exactly (~2.5e-5
        # relative, i.e. ~6e-3 absolute at this scale) — same relaxation as
        # the warp identity tests in test_core.py
        np.testing.assert_allclose(np.asarray(out[f]), np.asarray(want),
                                   atol=2e-2)
        np.testing.assert_array_equal(np.asarray(masks[f]), np.asarray(wmask))
