#!/bin/bash
# Round-2 queue R: supersedes queue Q's tail (runner killed after the
# N200 regression check passed at 1.9273e-2; the N400 retry was left
# in flight). Changes vs queue Q:
#   - DROPPED the two chunked-prefactor arms (proven RESOURCE_EXHAUSTED
#     at N300 — queue P darcy_N300_chunked).
#   - ADDED --gemm_solves arms: every queue-L/P N300 probe ran the
#     TRSV-form substitution sweeps (the flag is default-off), which are
#     latency-bound on TPU (single-rhs triangular solves per block —
#     6.76 s per mean solve where HBM-bound GEMM sweeps should cost
#     ~70 ms). PackedRInverseSolver GEMM-form solves are the designed
#     fix and were never phase-probed at N300 on this commit.
#   - sweep64 (the committed reference-config record) picks
#     --gemm_solves only if the gemm accuracy arm reproduces ~8.5e-5.
#   - ADDED flagship_pcg96: can GN actually descend below the march at
#     N800x100 with 96 f64-Krylov iterations (vs 32 default)?
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue R: waiting for running TPU jobs" \
  >> "$OUT/queue_r_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue R: starting schedule" >> "$OUT/queue_r_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_r_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_r_runner.log"
}

# 1. N300 phase probe with GEMM-form solves (vs 28.95 s trsv-form).
run_job darcy_N300_gemm 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --gemm_solves

# 2. Accuracy through the GEMM-solve path (expect ~8.5e-5).
run_job darcy_N300_gemm_acc 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --gemm_solves

# 3. N300 mean-solve decomposition probe (trsv vs gemm evidence).
run_job probe_resolve 2400 python experiments/probe_resolve.py

# 4. THE COMMITTED RECORD: 64-instance reference-config sweep; use
#    --gemm_solves only if arm 2 reproduced the accuracy.
GEMM_FLAG=""
ACC=$(grep "mean rel_err" "$OUT/darcy_N300_gemm_acc.log" | tail -1 | awk '{print $NF}')
if python - "$ACC" <<'EOF'
import sys
try:
    ok = float(sys.argv[1]) < 1e-3
except Exception:
    ok = False
sys.exit(0 if ok else 1)
EOF
then GEMM_FLAG="--gemm_solves"; fi
echo "sweep64 gemm flag: '$GEMM_FLAG' (acc=$ACC)" >> "$OUT/queue_r_runner.log"
run_job darcy_N300_sweep64 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only $GEMM_FLAG

# 5. Flagship with 96 f64-Krylov PCG iterations: does GN descend below
#    the march fixed point?
run_job flagship_pcg96 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg \
  --srif_pcg_iters 96 --gn_diag

# 6. chen24 N1000 with bhh1 (xla: 8.90e-5 in 126.8 s).
run_job chen24_N1000_bhh1 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1

# 7. Elliptic N100 with bhh1 — the engine-accuracy stress config.
run_job elliptic_N100_bhh1 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1

# 8. N300 accuracy with bhh1 (expect ~8.5e-5 like xla/bcgs4).
run_job darcy_N300_bhh1_acc 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1

echo "QUEUE R COMPLETE $(date)" >> "$STATUS"
