#!/bin/bash
# Round-2 queue W: RESILIENT consolidated runner, replacing the chained
# queues R(tail)/S/T/U/V after the 23:51 relay death (flagship_pcg96
# died mid-compile: "response body closed"; the device-probe then hung —
# docs/RELAY_FAULT_REPORT.md failure class). Every job is preceded by a
# relay health gate (subprocess matmul probe — in-process enumeration
# HANGS while the relay is down) and infrastructure failures (rc != 0
# with the relay subsequently unhealthy) are retried once.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_w.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_w_runner.log"

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}

relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180
    waited=$((waited + 180))
    if [ "$waited" -gt 21600 ]; then
      echo "=== relay down > 6h; giving up this gate" >> "$RLOG"
      return 1
    fi
  done
  return 0
}

run_job() {
  local name="$1" tmo="$2"; shift 2
  relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; return 1; }
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$RLOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ] && ! probe_relay; then
    # infrastructure death mid-job: wait for recovery, retry once
    echo "=== [$(date +%H:%M:%S)] $name rc=$rc with relay down; retrying" >> "$RLOG"
    relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; return 1; }
    t0=$SECONDS
    timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
    rc=$? dt=$((SECONDS - t0))
  fi
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  return $rc
}

echo "=== [$(date +%H:%M:%S)] queue W start" >> "$RLOG"

# --- queue R tail ---
run_job flagship_pcg96_w 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg \
  --srif_pcg_iters 96 --gn_diag
run_job chen24_N1000_bhh1_w 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1
run_job elliptic_N100_bhh1_w 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1
run_job darcy_N300_bhh1_acc_w 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1

# --- queue S ---
run_job darcy_N300_psplit 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split
PSPLIT_RC=$?
run_job sweep_N400x100_pad256 2400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 400 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 256 --srif_solve pcg

# --- queue T ---
run_job flagship_stdfix 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg
run_job sweep_N200x100_stdfix 1800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 200 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# --- queue U ---
run_job darcy_N300_sweep64_v2 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only
run_job probe_resolve_v2 2400 python experiments/probe_resolve.py
run_job darcy_N300_refine2 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --refine_iters 2
run_job darcy_N300_refine2_probe 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --refine_iters 2

# --- deferred follow-ups ---
if [ "$PSPLIT_RC" -eq 0 ]; then
  run_job darcy_N300_psplit8 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 8 --sqrt --sqrt_prefactor off \
    --phase_split
fi
run_job flagship_finedata 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --n_x_data 513 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# --- queue V ---
run_job chen24_N1000_gather 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise
run_job elliptic_N100_gather 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt
run_job bench_midround 3600 python bench.py

echo "QUEUE W COMPLETE $(date)" >> "$STATUS"
