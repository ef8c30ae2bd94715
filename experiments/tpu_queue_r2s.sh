#!/bin/bash
# Round-2 queue S: chains after queue R (waits for its COMPLETE marker).
#   1. darcy_N300_psplit — FULL posterior (mean + Takahashi std + sample)
#      at the reference default config via --phase_split: the fused
#      program needs 18.83 GiB (queue-L darcy_N300_full OOM); the split
#      dispatches keep peak HBM at ~(prior args + one factor + scan
#      carries). First-ever N300 std/sample record if it fits.
#   2. sweep_N400x100_pad256 — third N400 attempt with a GEOMETRY DODGE:
#      --pad_block 256 pads the spatial block to bs=1024 (vs the
#      reproducibly-crashing bs=896=7*128); N200 (512) and N800 (1664)
#      run clean, so the fault is tied to the 896 block shape.
#   3. darcy_N300_psplit8 — 8-instance full-posterior record (only if
#      arm 1 exits 0).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_s.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue S: waiting for queue R" \
  >> "$OUT/queue_s_runner.log"
while ! grep -q "QUEUE R COMPLETE" "$STATUS"; do
  sleep 120
done
# belt-and-braces: no TPU driver still running
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue S: starting schedule" >> "$OUT/queue_s_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_s_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_s_runner.log"
  return $rc
}

run_job darcy_N300_psplit 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split
PSPLIT_RC=$?

run_job sweep_N400x100_pad256 2400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 256 --srif_solve pcg

if [ "$PSPLIT_RC" -eq 0 ]; then
  run_job darcy_N300_psplit8 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 8 --sqrt --sqrt_prefactor off \
    --phase_split
fi

echo "QUEUE S COMPLETE $(date)" >> "$STATUS"
