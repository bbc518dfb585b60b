#!/bin/bash
# Round-4 on-chip measurement queue, part 3 (after the prof_batch b4/b6/b8
# sweep). Decision first (fused_solve A/B -> champion record), then the
# recorded artifacts the round-3 verdict asked for: roofline refresh,
# headline bench incl. dt_seconds_per_final_pair, the 225-jet teaser
# pipeline, the stage-3 serial-vs-batched A/B, and the production-shape
# operating-point sweep. Each step independently time-bounded; artifacts
# persist into tools/*_measured.json so bench.py finds them after /tmp wipes.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4_onchip3.log
echo "=== r4 onchip3 $(date) ===" >> "$LOG"

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { echo "tunnel down" >> "$LOG"; exit 1; }

# 1. fused-solve A/B at the champion batch; writes the champion record only
#    if the fused route wins
timeout 4800 python tools/prof_fsolve.py --batch 4 \
    --save /tmp/solve_champion.json >> "$LOG" 2>&1
[ -f /tmp/solve_champion.json ] \
    && cp /tmp/solve_champion.json tools/solve_champion_measured.json

# 2. roofline refresh
timeout 1800 python tools/roofline.py >> "$LOG" 2>&1
[ -f /tmp/roofline.json ] && cp /tmp/roofline.json tools/roofline_measured.json

# 3. headline bench at the measured champion (incl. dt_seconds_per_final_pair
#    and the embedded compact pipeline)
timeout 4800 python bench.py > /tmp/bench_r4_local.json 2>> "$LOG"
tail -1 /tmp/bench_r4_local.json >> "$LOG"

# 4. full-scale pipeline at teaser shape (225 jets; finals+threads exercise
#    the round-4 stage-3 batching) -> picked up as pipeline_full
timeout 7200 python tools/bench_pipeline.py --jets 225 --finals 4 \
    --threads 4 --save /tmp/bench_pipeline_full.json >> "$LOG" 2>&1
[ -f /tmp/bench_pipeline_full.json ] \
    && cp /tmp/bench_pipeline_full.json tools/bench_pipeline_measured.json

# 5. stage-3 serial-vs-batched A/B on chip
timeout 2400 python tools/prof_dt.py --ab >> "$LOG" 2>&1 || true

# 6. stage-3 operating-point sweep (quality + seconds at production shape)
timeout 3600 python tools/sweep_stage3.py --save /tmp/sweep_stage3.json >> "$LOG" 2>&1 || true
[ -f /tmp/sweep_stage3.json ] && cp /tmp/sweep_stage3.json tools/sweep_stage3_measured.json

echo "=== r4 onchip3 done $(date) ===" >> "$LOG"
grep -vE "WARNING|cpu_aot|Compile machine|E08" "$LOG" | tail -60
