#!/bin/bash
# Round-2 queue P: supersedes queues N+O (killed while still polling —
# no TPU job lost). Priority-ordered:
#   1. THE FLAGSHIP under the delta-form GN + f64-Krylov PCG + f64 line
#      search (commit faeccce) — every prior arm diverged because (a) the
#      direct-form solve amplified direction error by ||x||/||dx|| from
#      the warm start, (b) f32 PCG never fired the overflow-rescued
#      preconditioner sweeps, (c) the f32 damping objective carried ~1e2
#      noise. gn_diag logs per-step f64 MAP objective + trajectory
#      rel_err (instance 0) as the evidence chain.
#   2. bhh1 engine arms (rate/accuracy; ~19.9 TF/s actual-flop QR).
#   3. N300 chunked-prefactor arms (host-orchestrated window sweep fits
#      the measurement-update prefactor back into v5e HBM).
#   4. probe_resolve (N300 6.76 s resolve decomposition).
#   5. chen24 N1000 bhh1.
#   6. The 64-instance N300 reference-config sweep (committed record).
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue P: waiting for queue M + running TPU jobs" \
  >> "$OUT/queue_p_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[t]pu_queue_r2m.sh|[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue P: starting schedule" >> "$OUT/queue_p_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_p_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_p_runner.log"
}

# 1. Flagship N800x100 with the fixed numerics + diagnostics.
run_job flagship_fix 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag

# 2. The N400x100 rung (its queue-M arm crashed the relay mid-run).
run_job sweep_N400x100_fix 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 3. N300 rate with bhh1 (steady-state phase probe, prefactor off).
run_job darcy_N300_nopf_bhh1 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --srif_qr_impl bhh1

# 4. N300 chunked-prefactor rate (phase probe, xla engine).
run_job darcy_N300_chunked 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --phase_probe --mean_only

# 5. Same with the bhh1 engine — the combined best-rate config.
run_job darcy_N300_chunked_bhh1 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --phase_probe --mean_only --srif_qr_impl bhh1

# 6. Accuracy through the chunked path (2 instances; expect ~8.5e-5).
run_job darcy_N300_chunked_acc 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --mean_only

# 7. N300 accuracy with bhh1 (expect ~8.5e-5 like xla/bcgs4).
run_job darcy_N300_bhh1_acc 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1

# 8. Elliptic N100 with bhh1 — the engine-accuracy stress config
#    (xla: 6.88e-9 in 15.7 s; bcgs4 failed here at 3.4e-2).
run_job elliptic_N100_bhh1 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1

# 9. N300 mean-solve decomposition (the 6.76 s resolve delta).
run_job probe_resolve 2400 python experiments/probe_resolve.py

# 10. chen24 N1000 with bhh1 (xla: 8.90e-5 in 126.8 s).
run_job chen24_N1000_bhh1 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1

# 11. THE COMMITTED RECORD: 64-instance sweep at the reference Darcy
#     config (241x241 grid data, N_xy=300 mesh), mean-only, xla engine.
run_job darcy_N300_sweep64 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only

echo "QUEUE P COMPLETE $(date)" >> "$STATUS"
