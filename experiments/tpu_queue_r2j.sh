#!/bin/bash
# Round-2 queue J: relaunch of queue I's REMAINING jobs after the third
# environment reboot (queue I completed only chen24_N1000_f — 126.8 s,
# committed — before the runner died). Relay verified alive at launch.
# Jobs (rationale in tpu_queue_r2h.sh):
#   1. darcy_N300_pf      — N300 f32 re-measurement (413 fix + prefactor + split windows)
#   2. srif_qr_probe_tf32 — bhh/bcgs2 tf32 trailing-update rates
#   3. darcy_N300_tf32    — N300 with tensorfloat32 QR trailing updates
#   4. flagship_warm      — N800x100, fold + warm start + 25-step cap
#   5. burgers_2048_warm  — full sweep relaunch, fills remaining time
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue J: starting schedule" >> "$OUT/queue_j_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_j_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_j_runner.log"
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job darcy_N300_pf 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only
run_job srif_qr_probe_tf32 2400 python experiments/probe_srif_qr.py
run_job darcy_N300_tf32 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only \
  --srif_precision tensorfloat32
run_job flagship_warm 10800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --max_steps 25 --pad_block 128
run_job burgers_2048_warm 43200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise \
  --warm_start --max_steps 12 --sub_dtype f32

echo "QUEUE J COMPLETE $(date)" >> "$STATUS"
