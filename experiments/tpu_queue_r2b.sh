#!/bin/bash
# Round-2 follow-up TPU queue: waits for the primary queue runner
# (experiments/tpu_queue_r2.sh, pid in /tmp/tpuq.pid) to finish, then runs
# the jobs that depend on this session's code changes:
#   - probe_srif_qr now includes the tshh (TSQR-panel Householder) engine
#   - probe_front_rates has the HBM-budget fix (round-2 queue run OOMed)
#   - Darcy N300 single-instance phase probe with --srif_qr_impl tshh:
#     end-to-end check of the faster QR engine at production shape
# One TPU job at a time: never starts while the primary queue is alive.
set -u
cd /root/repo
PRIMARY_PID=$(cat /tmp/tpuq.pid 2>/dev/null || echo "")
if [ -n "$PRIMARY_PID" ]; then
  while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
fi
echo $$ > /tmp/tpuq_b.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)"
  find data/sims -name '*.json' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job srif_qr_probe_tshh 2400 python experiments/probe_srif_qr.py
run_job front_rates_v2     3600 python experiments/probe_front_rates.py
run_job darcy_N300_tshh    7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1 --sqrt --phase_probe --mean_only \
  --srif_qr_impl tshh

echo "QUEUE B COMPLETE $(date)" >> "$STATUS"
