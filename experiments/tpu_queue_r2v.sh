#!/bin/bash
# Round-2 queue V: chains after queue U. Regression confirmation of the
# gather-form transpose commit (128d8e0) on the two chen24 flagship
# configs (accuracy must be unchanged; wall should improve slightly —
# the refinement/PCG H-applications lost their scatter rmatvecs), plus
# a mid-round bench.py capture.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_v.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue V: waiting for queue U" \
  >> "$OUT/queue_v_runner.log"
while ! grep -q "QUEUE U COMPLETE" "$STATUS"; do
  sleep 120
done
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue V: starting schedule" >> "$OUT/queue_v_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_v_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_v_runner.log"
}

run_job chen24_N1000_gather 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise

run_job elliptic_N100_gather 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt

run_job bench_midround 3600 python bench.py

echo "QUEUE V COMPLETE $(date)" >> "$STATUS"
