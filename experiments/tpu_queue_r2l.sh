#!/bin/bash
# Round-2 queue L: post-queue-K TPU schedule.
#
# Informed by queue K results:
#   - flagship_damped diverged (rel_err 1.3): damping had no alpha=0
#     candidate — fixed (solvers/gauss_newton.py). Rerun expects
#     ~march quality (1.75e-2) on the f32 path.
#   - flagship f64-QR arm (srif_qr_dtype=f64): exact Newton directions
#     for the beyond-f32-validity N800x100 systems — the true-GN number.
#   - N300 with the SRIF prefactor still compiles 18.7G > 15.75G HBM:
#     the N300 production config is prefactor OFF (fits; ran before).
#     Re-probe phases + bcgs4 engine (with the indefinite-pivot fallback
#     that fixes queue K's elliptic_N100_bcgs4 NaN) at prefactor off.
#   - elliptic N100 bcgs4 NaN -> rerun with the fallback.
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue L: waiting for queue-K runner + jobs" \
  >> "$OUT/queue_l_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[t]pu_queue_r2k.sh|[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue L: starting schedule" >> "$OUT/queue_l_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_l_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_l_runner.log"
}

# 1. flagship with the alpha=0 safeguard (f32 path): expect GN pinned at
#    ~march quality instead of walking to rel_err 1.3
run_job flagship_safeguard 7200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128

# 2. flagship exact-direction arm: f64 window QR (no prefactor, ~47x QR)
run_job flagship_f64qr 7200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 12 --pad_block 128 --srif_qr_dtype f64

# 3. elliptic N100 bcgs4 rerun with the indefinite-pivot fallback
run_job elliptic_N100_bcgs4b 2400 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bcgs4

# 4/5. N300 prefactor-off: phase probe, xla vs bcgs4 engines
run_job darcy_N300_nopf_xla 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only
run_job darcy_N300_nopf_bcgs4 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --srif_qr_impl bcgs4

# 6. N300 accuracy + full instance wall with bcgs4 (prefactor off)
run_job darcy_N300_nopf_bcgs4_acc 4200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bcgs4

# 7. chen24 N1000 bcgs4 (fallback build) — skip if queue K's run succeeded
if ! grep -q "err_L2=[0-9]" "$OUT/chen24_N1000_bcgs4.log" 2>/dev/null; then
  run_job chen24_N1000_bcgs4b 3600 python experiments/chen24/burgers_chen24.py \
    --N_x 1000 --sqrt --stepwise --srif_qr_impl bcgs4
fi

echo "QUEUE L COMPLETE $(date)" >> "$STATUS"
