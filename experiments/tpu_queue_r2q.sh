#!/bin/bash
# Round-2 queue Q: supersedes the killed queue P runner (its remaining
# jobs are folded in below). Priority-ordered:
#   1. THE FLAGSHIP (N800x100) with --warm_src fit: queue P's gn_diag
#      proved the warm start itself was garbage (x0 rel_err 1.04 ~
#      ic-only; phi dropped 1.1e9 below the true march's objective,
#      impossible if x0 were the march) — the driver marched from slice
#      0 of the f32-conditioned posterior mean, while every probe that
#      measured 1.75e-2 marched from the dense-grid lstsq IC fit. The
#      driver now defaults to the fit IC.
#   2. N200 regression check + the N400 rung (crashed the relay twice).
#   3. Remaining queue-P jobs (N300 chunked-prefactor arms, bhh1
#      accuracy, elliptic bhh1, probe_resolve, chen24 N1000 bhh1, the
#      64-instance N300 committed-record sweep).
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue Q: waiting for running TPU jobs" \
  >> "$OUT/queue_q_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue Q: starting schedule" >> "$OUT/queue_q_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_q_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_q_runner.log"
}

# 1. Flagship N800x100 with the lstsq-fit warm start (+ diagnostics).
run_job flagship_warmfit 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag

# 2. N200 regression check under the fit warm start (was 1.93e-2).
run_job sweep_N200x100_warmfit 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 200 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 3. The N400x100 rung, third attempt (two relay crashes at this config).
run_job sweep_N400x100_warmfit 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 4. N300 chunked-prefactor + bhh1 combined rate (queue P leftover).
run_job darcy_N300_chunked_bhh1 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --phase_probe --mean_only --srif_qr_impl bhh1

# 5. Accuracy through the chunked path (expect ~8.5e-5).
run_job darcy_N300_chunked_acc 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --mean_only

# 6. N300 accuracy with bhh1 (expect ~8.5e-5 like xla/bcgs4).
run_job darcy_N300_bhh1_acc 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1

# 7. Elliptic N100 with bhh1 — the engine-accuracy stress config.
run_job elliptic_N100_bhh1 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1

# 8. N300 mean-solve decomposition (the 6.7 s resolve delta).
run_job probe_resolve 2400 python experiments/probe_resolve.py

# 9. chen24 N1000 with bhh1 (xla: 8.90e-5 in 126.8 s).
run_job chen24_N1000_bhh1 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1

# 10. THE COMMITTED RECORD: 64-instance sweep at the reference Darcy
#     config (241x241 grid data, N_xy=300 mesh), mean-only, xla engine.
run_job darcy_N300_sweep64 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only

echo "QUEUE Q COMPLETE $(date)" >> "$STATUS"
