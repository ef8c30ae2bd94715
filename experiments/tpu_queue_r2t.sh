#!/bin/bash
# Round-2 queue T: chains after queue S. Re-measure the flagship posterior
# std under the f64 Takahashi/sampling overflow rescue (commit 9cf0ce8):
# the committed flagship record has std_norms = NaN (results/
# burgers_gmrf-fem_N800x100_flagship.json); the rescue re-runs the
# variance recursion / sample sweep in f64 only when the f32 pass is
# non-finite, and the driver now counts any still-non-finite dofs.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_t.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue T: waiting for queue S" \
  >> "$OUT/queue_t_runner.log"
while ! grep -q "QUEUE S COMPLETE" "$STATUS"; do
  sleep 120
done
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue T: starting schedule" >> "$OUT/queue_t_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_t_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_t_runner.log"
}

# Flagship with the std rescue: expect finite std_norms and
# n_std_nonfinite = 0 (or a small honest count).
run_job flagship_stdfix 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# N200 regression under the same commit (std already healthy there;
# rel_err must stay 1.93e-2 and the cond-rescue must not regress time).
run_job sweep_N200x100_stdfix 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 200 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

echo "QUEUE T COMPLETE $(date)" >> "$STATUS"
