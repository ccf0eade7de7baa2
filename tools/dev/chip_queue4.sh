#!/bin/bash
# Round-5 chip queue: measurements for the code that changed this round —
# vision tower pad-to-128 flash path, q8 streamed-training transfer probe,
# 480p cross-attn retune post-qk-prep (write-tuned), then fresh primary
# (bf16 residual default) and e2e. Same gate protocol as chip_queue.sh
# (never kill an in-flight probe); honors /tmp/ROUND_DEADLINE.
#
#   nohup bash tools/dev/chip_queue4.sh > /tmp/chipq4.log 2>&1 &
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$(pwd)/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
START=${1:-1}
GATE_BUDGET=${GATE_BUDGET:-2700}

if [ -f /tmp/probe4.pid ] && kill -0 "$(cat /tmp/probe4.pid)" 2>/dev/null; then
  echo "[queue4] waiting for pre-existing probe $(cat /tmp/probe4.pid)"
  while kill -0 "$(cat /tmp/probe4.pid)" 2>/dev/null; do sleep 20; done
fi

gate() {
  local t0=$(date +%s) n=0
  while true; do
    n=$((n + 1))
    local log=/tmp/chipq/probe.$$.$n.log
    rm -f "$log"
    nohup python -c 'import jax, jax.numpy as jnp; x = jnp.ones((256, 256), jnp.bfloat16); print("PROBE_OK", float(jnp.sum((x @ x).astype(jnp.float32))), flush=True)' > "$log" 2>&1 &
    local pid=$!
    while true; do
      grep -q PROBE_OK "$log" 2>/dev/null && return 0
      if ! kill -0 "$pid" 2>/dev/null; then
        echo "[gate] probe $n exited unhealthy:" | tee -a /tmp/chipq/gate.log
        tail -2 "$log" | tee -a /tmp/chipq/gate.log
        break
      fi
      if [ $(( $(date +%s) - t0 )) -ge "$GATE_BUDGET" ]; then
        echo "[gate] budget ${GATE_BUDGET}s exhausted; ABANDONING probe $pid (never kill)" | tee -a /tmp/chipq/gate.log
        return 1
      fi
      sleep 15
    done
    [ $(( $(date +%s) - t0 )) -ge "$GATE_BUDGET" ] && return 1
    sleep 180
  done
}

step() {  # step <n> <timeout> <log> <cmd...>
  local n=$1 t=$2 log=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  if [ -f /tmp/ROUND_DEADLINE ]; then
    local dl=$(cat /tmp/ROUND_DEADLINE)
    if [ $(( $(date +%s) + t )) -ge "$dl" ]; then
      echo "[step $n] skipped: would overrun ROUND_DEADLINE" | tee -a /tmp/chipq/gate.log
      return 0
    fi
  fi
  echo "=== step $n: $* (timeout ${t}s) ==="
  gate || { echo "[step $n] tunnel dead; aborting queue"; exit 1; }
  timeout "$t" "$@" 2>&1 | tee "/tmp/chipq/$log"
  local rc=${PIPESTATUS[0]}
  echo "=== step $n done rc=$rc ==="
}
merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/r5_*.log 2>/dev/null; }

# 1. vision tower re-measure (pad-to-128 packed flash path)
step 1 900 r5_vision.log python tools/dev/tpu_qwen_layer_bench.py --vision_only
merge
# 2. q8 streamed-training transfer probe (emits q8 projection keys, bails
#    before any timeout-killable step)
step 2 700 r5_strain.log python tools/dev/bench_stream_train.py --frames 21
merge
# 3. 480p A14B block retune post-qk-prep (persists winners when >1% better)
step 3 1500 r5_a14b_ab.log python tools/dev/bench_a14b_ab.py --tag 480p --write-tuned
merge
# 4. fresh primary at HEAD (bf16 residual default)
step 4 1500 r5_primary.log python bench.py --phase primary
merge
# 5. e2e 480p refresh (bf16 residual pipeline)
step 5 1500 r5_e2e.log python bench.py --phase e2e
merge
echo "queue4 complete"
# 6. measured full-model 30B-A3B decode (expert-on-demand streaming)
step 6 1500 r5_fulldecode.log python tools/dev/tpu_qwen_full_decode.py --prompt_len 16 --tokens 3
merge
echo "queue4b complete"
# 7. vision component A/B (41 ms regression triage: where do 30+ ms hide?)
step 7 900 r5_vision_ab.log python tools/dev/bench_vision_ab.py
merge
echo "queue4c complete"
# 8-9. A14B full-depth steps with the bf16 residual default (r4 numbers
# were f32-residual: 0.859/0.887 MXU — 720p may cross 0.9)
step 8 1200 r5_a14b_stream.log env BENCH_STREAM_BUDGET_S=1000 python bench.py --phase a14b_stream
merge
step 9 800 r5_a14b_stream720.log python bench.py --phase a14b_stream720
merge
echo "queue4d complete"
# 10. vision per-block re-measure with the dispatch floor amortized
#     (depth-8 scanned tower in ONE dispatch)
step 10 900 r5_vision2.log python tools/dev/tpu_qwen_layer_bench.py --vision_only
merge
echo "queue4e complete"
