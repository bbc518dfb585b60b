#!/bin/bash
# Round-4 on-chip measurement plan (VERDICT r3 items 2, 4, 5, 9).
# Run the moment the TPU tunnel is back. Each step is independently
# time-bounded and appends to /tmp/r4_onchip.log; artifacts land where
# bench.py picks them up.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4_onchip.log
echo "=== r4 onchip $(date) ===" >> "$LOG"

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { echo "tunnel still down" >> "$LOG"; exit 1; }

# 1. merged-kernel sweep: batch x kernel-route, picks the jets/s champion
timeout 3000 python tools/prof_merged.py --sweep >> "$LOG" 2>&1

# 2. roofline refresh (caches /tmp/roofline.json for bench.py)
timeout 1200 python tools/roofline.py >> "$LOG" 2>&1

# 3. headline bench at the champion batch (edit --batch if step 1 says so)
timeout 3000 python bench.py --batch 8 >> "$LOG" 2>&1

# 4. full-scale pipeline at teaser shape (225 jets; finals+threads exercise
#    the round-4 stage-3 batching) -> picked up as pipeline_full
timeout 5400 python tools/bench_pipeline.py --jets 225 --finals 4 \
    --threads 4 --save /tmp/bench_pipeline_full.json >> "$LOG" 2>&1

# 5. stage-3 serial-vs-batched A/B on chip (the CPU A/B was 0.83x; the
#    batching thesis is TPU-latency-bound kernels, decide the default here)
timeout 1800 python tools/prof_dt.py --ab >> "$LOG" 2>&1 || true
timeout 1200 python tools/prof_dt.py >> "$LOG" 2>&1 || true

# 6. stage-3 operating-point sweep (quality + seconds at production shape)
timeout 2400 python tools/sweep_stage3.py --save /tmp/sweep_stage3.json >> "$LOG" 2>&1 || true

echo "=== r4 onchip done $(date) ===" >> "$LOG"
tail -40 "$LOG"
