#!/bin/bash
# Round-2 queue Z: chains after queue Y.
#   1. front_rates_v3 — the extended probe (batched blocked POTRF +
#      vmapped all-GEMM bcgs4 QR columns): the measured decision data for
#      the round-3 multifrontal/ND direction (ROADMAP "Open" item 0).
#   2. darcy_N300_sweep1024 — the reference's FULL default config
#      (1024 instances at N_xy=300, scripts/darcy/solve_darcy_gmrf-fem.jl
#      defaults), mean-only, via the IncrementalSaver path: per-instance
#      rows checkpoint to .partial.jsonl, a sidecar loop commits them
#      every 10 min, and the arm's timeout is clamped to a HARD DEADLINE
#      so the chip is free before the driver's end-of-round bench.py run
#      (bench waits at most 1800 s for queue jobs).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_z.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_z_runner.log"
# hard deadline (epoch s): leave >=50 min of slack before round end for
# the final commit + the driver's bench.py
DEADLINE=${DEADLINE:-$(( $(date +%s) + 36000 ))}

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}
relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180; waited=$((waited + 180))
    [ "$waited" -gt 14400 ] && return 1
  done
  return 0
}
commit_results() {
  find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
    -newer /tmp/tpuq_z_stamp -exec cp {} "$OUT/" \; 2>/dev/null
  touch /tmp/tpuq_z_stamp
  git add "$OUT" >/dev/null 2>&1 || { sleep 7; git add "$OUT" >/dev/null 2>&1; }
  git commit -q -m "tpu queue Z: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 \
    || { sleep 7; git commit -q -m "tpu queue Z: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true; }
}
run_job() {
  local name="$1" tmo="$2"; shift 2
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
  echo "=== [$(date +%H:%M:%S)] $name (tmo=${tmo}s): $*" | tee -a "$OUT/$name.log" >> "$RLOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ] && ! probe_relay; then
    echo "=== [$(date +%H:%M:%S)] $name rc=$rc with relay down; retrying" >> "$RLOG"
    relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 300 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
    [ "$tmo" -gt "$left" ] && tmo=$left
    t0=$SECONDS
    timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
    rc=$? dt=$((SECONDS - t0))
  fi
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  commit_results "$name" "$rc"
  return $rc
}

touch /tmp/tpuq_z_stamp
echo "=== [$(date +%H:%M:%S)] queue Z: waiting for queue Y (deadline $(date -d @$DEADLINE 2>/dev/null || echo $DEADLINE))" >> "$RLOG"
while ! grep -q "QUEUE Y COMPLETE" "$STATUS" 2>/dev/null; do
  [ $(( DEADLINE - $(date +%s) )) -lt 600 ] && { echo "QUEUE Z DEADLINE before Y finished $(date)" >> "$STATUS"; commit_results deadline 0; exit 0; }
  sleep 120
done
echo "=== [$(date +%H:%M:%S)] queue Z: starting" >> "$RLOG"

run_job front_rates_v3 5400 python experiments/probe_front_rates.py
run_job probe_multifrontal 5400 python experiments/probe_multifrontal.py \
  --sizes 32 64 128

# sidecar: commit the 1024-sweep's partial rows every 10 min
(
  while [ -f /tmp/tpuq_z_sweeping ]; do
    sleep 600
    [ -f /tmp/tpuq_z_sweeping ] || break
    commit_results "sweep1024 partial" periodic
  done
) &
SIDECAR=$!
touch /tmp/tpuq_z_sweeping
run_job darcy_N300_sweep1024 28800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1024 --sqrt --sqrt_prefactor off \
  --mean_only
rm -f /tmp/tpuq_z_sweeping
wait "$SIDECAR" 2>/dev/null

echo "QUEUE Z COMPLETE $(date)" >> "$STATUS"
commit_results "queue_z_complete" 0
