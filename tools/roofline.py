"""FLOP / HBM-byte accounting for the jet-solve hot path (roofline).

Measures each phase of one outer iteration on the live chip (same harness
as tools/prof_iter.py: chained fori with CSE-proof perturbation, warm
compile cache) and pairs it with ANALYTIC work counts derived from the
configuration, so achieved rates are judged against hardware ceilings
rather than repo history.

Assumed TPU v5e ceilings (per chip, public spec):
  HBM bandwidth     819 GB/s
  MXU bf16          197 TFLOP/s   (f32 via 3-pass ~ 1/4 of that)
  VPU f32           ~7.7 TFLOP/s  (8x128 lanes x 4 sublanes x FMA x ~940 MHz)

Work model per outer iteration at [H, W], S=3 (n = 2*ref = 4 frame
offsets, C = 3 channels), fused path:
  shift-warp   per px/frame/ch: (K+1)^2 MAC over the in-VMEM shift grid
               (K=4 ladder step assumed: 25 MAC); HBM: read seq + write
               warped (2 * F * C planes) + flow (2 planes)
  fused assembly per px/offset: two 8-field derivative stacks (5-tap
               separable convs, 10 MAC each) x C + ~60 FLOP IRLS math;
               HBM: read warped (F*C planes), write 5 planes
  SOR          30 iter x 2 half-sweeps x ~23 FLOP/px; VMEM-resident
               (12 planes ~6 MB << VMEM), HBM: read 7 coeff planes +
               2 flow planes once, write 2
  smoothness   ~70 FLOP/px; HBM ~6 planes

Prints one JSON line and caches it to /tmp/roofline.json (bench.py embeds
it when present). Run on the real chip: python tools/roofline.py
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HBM_GBS = 819.0
VPU_TFLOPS = 7.7
MXU_BF16_TFLOPS = 197.0

H, W, REF = 270, 480, 2
F = 2 * REF + 1
C = 3
N_OFF = 2 * REF
PLANE_MB = H * W * 4 / 1e6


def phase_work():
    """Analytic (flops, hbm_bytes) per phase for ONE outer iteration."""
    px = H * W
    warp_flops = px * (F - 1) * C * 2 * 25          # MAC = 2 FLOP, K=4 grid
    warp_bytes = (2 * F * C + 2) * PLANE_MB * 1e6
    # derivatives: per offset, 2 stacks (succ + to-ref) x 8 fields x C,
    # 5-tap separable conv = 10 MAC; IRLS assembly ~60 FLOP/px/offset
    deriv_flops = px * N_OFF * (2 * 8 * C * 2 * 10 + 120)
    deriv_bytes = (F * C + N_OFF + 5) * PLANE_MB * 1e6
    sor_flops = px * 30 * 2 * 23
    sor_bytes = 11 * PLANE_MB * 1e6                 # in/out once; VMEM-resident
    smooth_flops = px * 70
    smooth_bytes = 6 * PLANE_MB * 1e6
    # merged warp+assembly (fused_warp.py): same arithmetic as warp +
    # assembly, minus the warped stack's HBM write + re-read (2*F*C planes)
    merged_flops = warp_flops + deriv_flops
    merged_bytes = warp_bytes + deriv_bytes - 2 * F * C * PLANE_MB * 1e6
    return {
        "warp": (warp_flops, warp_bytes),
        "assembly": (deriv_flops, deriv_bytes),
        "merged": (merged_flops, merged_bytes),
        "sor30": (sor_flops, sor_bytes),
        "smoothness": (smooth_flops, smooth_bytes),
    }


def measure():
    import jax
    import jax.numpy as jnp

    from slowflow_tpu.core.penalty import make_penalty
    from slowflow_tpu.core.solver import sor_coupled_rb
    from slowflow_tpu.core.warp_shift import warp_stack_auto
    from slowflow_tpu.variational.fused_data import fused_data_system
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, compute_smoothness_mt, succ_mask)

    p = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                         rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                         p_scale=0.9, niter_alter=10, niter_outer=10,
                         niter_solver=30, occlusion_reasoning=True,
                         smoothing=1)
    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.random((F, 3, H, W)), jnp.float32) * 255.0
    wx = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
    wy = jnp.asarray(rng.random((H, W)), jnp.float32) * 2.0
    cw = jnp.ones((3, H, W), jnp.float32)
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
        # the tunneled backend adds ~70 ms round-trip jitter per dispatch:
        # time n vs 4n chained iterations, min over repeats, so dispatch
        # latency cancels and noise is bounded away
        float(run(args, n))
        float(run(args, 4 * n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(run(args, n))
            t1 = time.perf_counter(); float(run(args, 4 * n))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (3 * n))
        return max(best, 1e-9)

    def f_warp(seq, wx, wy):
        return warp_stack_auto(seq, wx, wy, REF, interpret=interp)

    warped, masks = f_warp(seq, wx, wy)
    gated = succ_mask(masks, REF)

    def f_assembly(warped, gated, du, dv, cw):
        return fused_data_system(warped, gated, du, dv, cw, p,
                                 mode="assembly", interpret=interp)

    def f_sor(du, dv, a11, a12, a22, b1, b2, wh, wv):
        return sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                              iterations=30, omega=1.9)

    def f_smooth(uu, vv, dw):
        return compute_smoothness_mt(uu, vv, dw, p.alpha, reg_pen,
                                     p.smoothing)

    from slowflow_tpu.variational.fused_warp import fused_warp_data

    def f_merged(seq, wx, wy, gated, du, dv, cw):
        return fused_warp_data(seq, wx, wy, gated, du, dv, cw, p,
                               mode="assembly", interpret=interp)

    du = jnp.zeros((H, W))
    dv = jnp.zeros((H, W))
    a = jnp.ones((H, W))
    b = plane * 0.1
    wh = plane * 0.5
    wv = plane * 0.4

    # iteration counts sized so the timed span dwarfs the ~70 ms tunnel
    # round-trip (fast phases need many more chained iterations)
    times = {
        "warp": timed(f_warp, 100, seq, wx, wy),
        "assembly": timed(f_assembly, 100, warped, gated, du, dv, cw),
        "merged": timed(f_merged, 100, seq, wx, wy, gated, du, dv, cw),
        "sor30": timed(f_sor, 1000, du, dv, a, b, a, b, b, wh, wv),
        "smoothness": timed(f_smooth, 1000, wx, wy, plane),
    }
    return times


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    times = measure()
    work = phase_work()
    phases = {}
    total_t = total_f = total_b = 0.0
    for k, t in times.items():
        fl, by = work[k]
        phases[k] = {
            "ms": round(t * 1e3, 3),
            "gflop": round(fl / 1e9, 3),
            "hbm_mb": round(by / 1e6, 1),
            "achieved_tflops": round(fl / t / 1e12, 3),
            "achieved_gbs": round(by / t / 1e9, 1),
            "vpu_util": round(fl / t / 1e12 / VPU_TFLOPS, 3),
            "hbm_util": round(by / t / 1e9 / HBM_GBS, 3),
        }
        if k != "merged":
            # "merged" is an ALTERNATIVE to warp+assembly, not an extra
            # phase: the outer-iteration total reflects the two-kernel
            # composition; compare phases.merged against warp+assembly
            total_t += t
            total_f += fl
            total_b += by
    out = {
        "outer_iter_ms": round(total_t * 1e3, 3),
        "outer_iter_gflop": round(total_f / 1e9, 3),
        "outer_iter_hbm_mb": round(total_b / 1e6, 1),
        "vpu_util": round(total_f / total_t / 1e12 / VPU_TFLOPS, 3),
        "hbm_util": round(total_b / total_t / 1e9 / HBM_GBS, 3),
        "assumed_peaks": {"hbm_gbs": HBM_GBS, "vpu_f32_tflops": VPU_TFLOPS,
                          "mxu_bf16_tflops": MXU_BF16_TFLOPS},
        "phases": phases,
    }
    Path("/tmp/roofline.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
