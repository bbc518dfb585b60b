#!/bin/sh
# Round-5 on-chip measurement queue — run on a QUIET host (no test suite
# competing for the single core; host contention skews dispatch timing).
# Each step appends to /tmp/r5_onchip.log; artifacts land in /tmp and the
# winners are copied into tools/*_measured.json by hand after review.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# 1. fuse_occ A/B at the champion config (numeric-gated promotion)
timeout 3000 python tools/prof_occfuse.py --batch 4 \
    --save /tmp/solve_champion.json

# 2. packed-SOR retry on the current libtpu (verdict item 8; numeric-gated)
timeout 3000 python tools/prof_packed.py --batch 4 \
    --save /tmp/solve_champion.json

# 3. unrolled b6/b8 sweep (verdict item 3: only vmapped large batches were
#    ever measured; measures at the incumbent champion's route flags)
timeout 6000 python tools/prof_merged.py --unroll-sweep 4,6,8

# 4. stage-2 host-tax breakdown at production shape (SF_PROF phase report)
SF_PROF=1 timeout 3000 python tools/bench_pipeline.py --jets 8 --finals 1 \
    --batch 4 --out /tmp/prof_pipeline

# 5. repeat the 8-jet pipeline bench 3x for the dt_flow_err_px noise
#    question (verdict item 6)
for i in 1 2 3; do
  timeout 3000 python tools/bench_pipeline.py --jets 8 --finals 2 \
      --threads 2 --out /tmp/bench_pipeline_rep$i \
      --save /tmp/bench_pipeline_rep$i.json
done
