#!/bin/bash
# Round-2 queue M: the PCG direction-solve arms.
#
# Informed by queue L results (RESULTS.md):
#   - flagship safeguard arm executes but can't move (rel_err 1.28):
#     directions garbage, refinement pinned at first-sweep quality.
#   - f64 window QR faults the relay at N800x100 -> fix must stay f32.
#   - New: SRIFNewtonFactor(solve_method="pcg") uses the f32 factor as a
#     CG preconditioner — measured at the f64 solve floor (3e-6) in
#     <= 16 iterations where refinement returns rel_err 28 (CPU,
#     cond 7e10). Expect the flagship to finally converge toward the
#     march trajectory (~1.75e-2) on the TPU in f32.
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue M: waiting for running TPU jobs" \
  >> "$OUT/queue_m_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[t]pu_queue_r2l.sh|[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue M: starting schedule" >> "$OUT/queue_m_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_m_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_m_runner.log"
}

# 1. FLAGSHIP with PCG directions: the headline arm. Expect convergence
#    to ~march quality or better (queue-L safeguard arm: 1.28).
run_job flagship_pcg 10800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 2/3. Sweep completeness at N_t=100: N200 (committed f64 CPU number
#    1.93e-2 post-seam-fix) and N400 PCG arms on the TPU.
run_job sweep_N200x100_pcg 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 200 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg
run_job sweep_N400x100_pcg 7200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# 4. chen24 N1000 PCG arm: does the ~6e-5 decrement plateau clear and the
#    early stop fire (xla-engine baseline: 8.90e-5 in 126.8 s, 30 steps)?
run_job chen24_N1000_pcg 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_solve pcg

echo "QUEUE M COMPLETE $(date)" >> "$STATUS"
