#!/bin/bash
# Round-2 queue O: chunked-prefactor arms at N300.
#
# The SRIF measurement-update prefactor cuts per-instance QR flops ~2.4x
# but its fused conditioning program needs 18.7 GiB (> v5e 15.75,
# RESULTS.md queue K). srif_packed_qr_chunked runs the window sweep as
# host-orchestrated dispatches with a DONATED factor state — peak HBM
# ~= prefactor (4.98) + factor state (5.35) + one chunk's QR workspace.
# Expect cond+mean 28.95 s (nopf xla) -> ~13-16 s; with bhh1 lower still.
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue O: waiting for queues M/N + running TPU jobs" \
  >> "$OUT/queue_o_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[t]pu_queue_r2[mn].sh|[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue O: starting schedule" >> "$OUT/queue_o_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_o_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_o_runner.log"
}

# 0. THE FLAGSHIP under the delta-form GN + f64-Krylov PCG + f64 line
#    search (commit faeccce): every prior arm diverged because (a) the
#    direct-form solve amplified direction error by ||x||/||dx|| from the
#    warm start, (b) f32 PCG never fired the overflow-rescued
#    preconditioner sweeps, (c) the f32 damping objective carried ~1e2
#    noise. gn_diag logs the per-step f64 MAP objective + trajectory
#    rel_err (instance 0) as the evidence chain.
run_job flagship_fix 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag

# 0b. The N400x100 rung (its queue-M arm crashed the relay mid-run).
run_job sweep_N400x100_fix 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 1. N300 chunked-prefactor rate (phase probe, xla engine).
run_job darcy_N300_chunked 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --phase_probe --mean_only

# 2. Same with the bhh1 engine — the combined best-rate config.
run_job darcy_N300_chunked_bhh1 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --phase_probe --mean_only --srif_qr_impl bhh1

# 3. Accuracy through the chunked path (2 instances; expect ~8.5e-5).
run_job darcy_N300_chunked_acc 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor chunked \
  --mean_only

echo "QUEUE O COMPLETE $(date)" >> "$STATUS"
