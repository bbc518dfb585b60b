"""Full-solve A/B of pallas_sor on the live chip at the champion config
(b4 unroll merge=1): prof_iter_composed measured the composed outer
iteration at 0.633 ms with the XLA SOR vs 0.435 ms with the VMEM-resident
Pallas SOR — the isolated-phase comparison that left pallas_sor off
(0.27 ms vs 0.163 ms, docs/PROFILING.md) inverts in composition because
the XLA fori body streams its planes through HBM every half-sweep while
the fused kernel holds them in VMEM for all 30 iterations.

Run: python tools/prof_psor.py [--batch 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import replace
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

H, W, REF = 270, 480, 2
F = 2 * REF + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _moving_sequence
    from slowflow_tpu.variational.multiframe import (
        MultiFrameParams, variational_mt_batched)

    p0 = MultiFrameParams(S=3, alpha=4.0, gamma=6.0, delta=1.0,
                          rho=(1.0, 1.0), omega=(0.0, 2.0), layers=5,
                          p_scale=0.9, niter_alter=10, niter_outer=10,
                          niter_inner=1, niter_solver=30,
                          occlusion_reasoning=True, smoothing=1,
                          merge_warp=True, unroll_jets=True, jet_vmap=False,
                          pallas_sor=False)  # explicit: the default is auto
    b = args.batch
    seq = jnp.asarray(np.stack(
        [_moving_sequence(F, H, W, 1.5 + 0.2 * s, -0.8, seed=s)
         for s in range(b)]))
    z = jnp.zeros((b, H, W), jnp.float32)
    jax.block_until_ready(seq)

    outs = {}
    for label, pv in (("psor=0", p0),
                      ("psor=1", replace(p0, pallas_sor=True))):
        def run():
            out = variational_mt_batched(z, z, seq, pv)
            # fetching a scalar is the only reliable completion barrier on
            # the tunneled backend (docs/PROFILING.md)
            float(sum(jnp.sum(o) for o in out))
            return out

        out = run()  # compile
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        outs[label] = out
        print(f"solve b{b} unroll merge=1 {label}: {t:6.3f} s/batch "
              f"{b / t:5.2f} jets/s", flush=True)
        if label == "psor=1":
            wx0, wy0 = np.asarray(outs["psor=0"][0]), np.asarray(outs["psor=0"][1])
            wx1, wy1 = np.asarray(out[0]), np.asarray(out[1])
            d = max(np.abs(wx1 - wx0).max(), np.abs(wy1 - wy0).max())
            print(f"max |flow diff| psor on/off: {d:.2e}", flush=True)
            rec = {"batch": b, "mode": "unroll", "merge_warp": True,
                   "pallas_sor": True, "jets_per_sec": round(b / t, 3)}
            with open("/tmp/psor_solve.json", "w") as fh:
                json.dump(rec, fh)


if __name__ == "__main__":
    main()
