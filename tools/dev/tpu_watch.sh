#!/bin/bash
# TPU outage watcher: probe until the backend answers, then run the REDUCED
# chip queue (decisive driver-facing measurements first). Probes are NEVER
# killed (a kill of an in-flight op wedges the tunnel — CLAUDE.md); a probe
# that hangs is simply polled, one in flight at a time.
#
#   nohup bash tools/dev/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
set -u
cd "$(dirname "$0")/../.."
DEADLINE=${WATCH_DEADLINE_S:-21600}   # give up after 6h by default
t0=$(date +%s)
n=0
while true; do
  n=$((n + 1))
  log=/tmp/tpu_watch_probe.$n.log
  rm -f "$log"
  nohup python -c 'import jax, jax.numpy as jnp, datetime; x = jnp.ones((256,256), jnp.bfloat16); print("PROBE_OK", float(jnp.sum((x @ x).astype(jnp.float32))), datetime.datetime.utcnow().isoformat(), flush=True)' > "$log" 2>&1 &
  pid=$!
  echo "[watch] probe $n pid=$pid $(date -u +%H:%M:%S)"
  while kill -0 "$pid" 2>/dev/null; do
    grep -q PROBE_OK "$log" 2>/dev/null && break
    sleep 20
  done
  if grep -q PROBE_OK "$log" 2>/dev/null; then
    echo "[watch] TPU BACK at $(date -u +%H:%M:%S) — launching reduced queue"
    touch /tmp/TPU_BACK
    REDUCED=1 bash tools/dev/chip_queue.sh 2>&1 | tee /tmp/chipq_watch.log
    echo "[watch] queue finished rc=${PIPESTATUS[0]}"
    exit 0
  fi
  if [ $(( $(date +%s) - t0 )) -ge "$DEADLINE" ]; then
    echo "[watch] deadline ${DEADLINE}s exhausted; giving up"
    exit 1
  fi
  echo "[watch] probe $n unhealthy ($(tail -1 "$log" | head -c 120)); pausing 240s"
  sleep 240
done
