#!/bin/bash
# Round-4 on-chip measurement queue, part 2 (VERDICT r3 items 2, 4, 5, 9).
# Picks up after the prof_merged sweep (champion: b4 unroll merge=0,
# 2.84 jets/s — tools/solve_champion_measured.json). Each step is
# independently time-bounded, appends to /tmp/r4_onchip2.log, and persists
# its artifact into tools/*_measured.json so bench.py finds it after /tmp
# is wiped.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4_onchip2.log
echo "=== r4 onchip2 $(date) ===" >> "$LOG"

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { echo "tunnel down" >> "$LOG"; exit 1; }

# 1. roofline refresh (caches /tmp/roofline.json for bench.py)
timeout 1800 python tools/roofline.py >> "$LOG" 2>&1
[ -f /tmp/roofline.json ] && cp /tmp/roofline.json tools/roofline_measured.json

# 2. headline bench at the measured champion (incl. dt_seconds_per_final_pair
#    and the embedded compact pipeline)
timeout 4800 python bench.py > /tmp/bench_r4_local.json 2>> "$LOG"
tail -1 /tmp/bench_r4_local.json >> "$LOG"

# 3. full-scale pipeline at teaser shape (225 jets; finals+threads exercise
#    the round-4 stage-3 batching) -> picked up as pipeline_full
timeout 7200 python tools/bench_pipeline.py --jets 225 --finals 4 \
    --threads 4 --save /tmp/bench_pipeline_full.json >> "$LOG" 2>&1
[ -f /tmp/bench_pipeline_full.json ] \
    && cp /tmp/bench_pipeline_full.json tools/bench_pipeline_measured.json

# 4. stage-3 serial-vs-batched A/B on chip
timeout 2400 python tools/prof_dt.py --ab >> "$LOG" 2>&1 || true

# 5. stage-3 operating-point sweep (quality + seconds at production shape)
timeout 3600 python tools/sweep_stage3.py --save /tmp/sweep_stage3.json >> "$LOG" 2>&1 || true
[ -f /tmp/sweep_stage3.json ] && cp /tmp/sweep_stage3.json tools/sweep_stage3_measured.json

echo "=== r4 onchip2 done $(date) ===" >> "$LOG"
tail -30 "$LOG"
