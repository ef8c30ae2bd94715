#!/bin/bash
# Round-2 queue K: post-2048-sweep TPU schedule.
#
# Waits for the running burgers_2048_warm python (queue J's final job) to
# exit, then runs the measurements unblocked by this session's fixes:
#   1. flagship_damped  — N800x100 with seam fold + warm start + DAMPING
#                         (queue J's flagship_warm diverged without damping:
#                         undamped GN from a good warm start at N800, rel_err
#                         3.9 at 4 plateau-stopped steps; march itself is
#                         1.75e-2 — march_check 800)
#   2. darcy_N300_pf2   — N300 phase probe, sqrt-operand pruning fix for the
#                         RESOURCE_EXHAUSTED (drop_sqrt_operands: ~1.07 GB)
#   3. darcy_N300_full  — full posterior (mean+std+sample), 2 instances,
#                         production engine (xla Householder)
#   4. darcy_N300_bcgs2 — probe: all-GEMM BCGS2 engine (TPU 30.3 TF/s vs
#                         xla 13.0) + 12 refinement iters — N64 CPU shows
#                         bcgs2 needs ~12 iters to reach the floor
#                         (contraction ~0.42/iter; engines separate at
#                         production conditions, see RESULTS.md)
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue K: waiting for burgers_2048_warm to exit" \
  >> "$OUT/queue_k_runner.log"
while [ -n "$(ps -eo cmd | grep '[s]olve_burgers_gmrf_fem.py --N_x 128' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue K: starting schedule" >> "$OUT/queue_k_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_k_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_k_runner.log"
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job flagship_damped 7200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128
run_job darcy_N300_pf2 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only
run_job darcy_N300_full 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt
# full posterior (Takahashi variance holds a second factor-sized buffer):
# if the resident prefactor pushed it over HBM, retry without it
if [ "$(tail -c 400 "$OUT/darcy_N300_full.log" | grep -c RESOURCE_EXHAUSTED)" != "0" ]; then
  run_job darcy_N300_full_nopf 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off
fi
# bcgs4 (staged-shift CholQR4 panels): at N64 CPU production conditions it
# reaches the Householder accuracy floor (9.2123e-7) with ZERO refinement
# iterations — all-GEMM QR at Householder-grade quality. Probe its N300
# rate (phase timing) and its N300 accuracy (mean-only run).
run_job darcy_N300_bcgs4 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only \
  --srif_qr_impl bcgs4
run_job darcy_N300_bcgs4_acc 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --mean_only \
  --srif_qr_impl bcgs4

# chen24 flagships with the bcgs4 engine (SRIF QR dominates both; current
# committed numbers: elliptic N100 15.7 s, burgers N1000 126.8 s)
run_job elliptic_N100_bcgs4 2400 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bcgs4
run_job chen24_N1000_bcgs4 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bcgs4

echo "QUEUE K COMPLETE $(date)" >> "$STATUS"
