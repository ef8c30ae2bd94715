#!/bin/bash
# Round-2 queue Y: re-run of the queue-W tail + queue-X arms lost to the
# 04:05 VM reboot (the disk reverts to the last committed git state on
# reboot, so every uncommitted results/tpu_queue log vanished — only the
# RESULTS.md harvest prose survived). Fix: run_job now COMMITS
# results/tpu_queue after every arm.
#
# Arms (value order):
#   1. darcy_N300_full_nopf   — fused FULL posterior (mean+std+sample)
#      with --sqrt_prefactor off; the queue-L OOM ran prefactor-on
#      (+5 GiB resident) and psplit OOMs on the factor-export copy.
#   2. chen24_N1000_gather / elliptic_N100_gather — xla-engine controls
#      WITH the gather-transpose commit, to separate bhh1-engine vs
#      gather-rmatvec contributions before any default switch.
#   3. bench_midround — re-capture bench.py with the current kernels.
#   4. elliptic_N100_bhh1 / darcy_N300_bhh1_acc / chen24_N1000_bhh1 —
#      bhh1 re-measurements (harvest numbers lost with the logs).
#   5. darcy_N300_sweep64 — 64-instance reference-config N300 sweep.
#   6. darcy_N300_refine2(+probe), flagship_finedata, probe_resolve_v2.
#   7. darcy_N300_full8 if (1) fits.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_y.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_y_runner.log"

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}
relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180; waited=$((waited + 180))
    [ "$waited" -gt 21600 ] && return 1
  done
  return 0
}
commit_results() {
  # copy fresh result JSONs out of gitignored data/sims, then commit the
  # queue dir; retry once on index-lock contention with the main session
  find data/sims -name '*.json' -newer /tmp/tpuq_y_stamp -exec cp {} "$OUT/" \; 2>/dev/null
  touch /tmp/tpuq_y_stamp
  git add "$OUT" >/dev/null 2>&1 || { sleep 7; git add "$OUT" >/dev/null 2>&1; }
  git commit -q -m "tpu queue Y: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 \
    || { sleep 7; git commit -q -m "tpu queue Y: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true; }
}
run_job() {
  local name="$1" tmo="$2"; shift 2
  relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$RLOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ] && ! probe_relay; then
    echo "=== [$(date +%H:%M:%S)] $name rc=$rc with relay down; retrying" >> "$RLOG"
    relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
    t0=$SECONDS
    timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
    rc=$? dt=$((SECONDS - t0))
  fi
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  commit_results "$name" "$rc"
  return $rc
}

touch /tmp/tpuq_y_stamp
echo "=== [$(date +%H:%M:%S)] queue Y start" >> "$RLOG"

run_job darcy_N300_full_nopf 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off
FULL_RC=$?

run_job chen24_N1000_gather 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise
run_job elliptic_N100_gather 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt
run_job bench_midround 3600 python bench.py
run_job elliptic_N100_bhh1_y 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1
run_job darcy_N300_bhh1_acc_y 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1
run_job chen24_N1000_bhh1_y 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1

run_job darcy_N300_sweep64_y 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only

if [ "$FULL_RC" -eq 0 ]; then
  run_job darcy_N300_full8 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 8 --sqrt --sqrt_prefactor off
fi

run_job darcy_N300_refine2_y 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --refine_iters 2
run_job darcy_N300_refine2_probe_y 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --refine_iters 2
run_job flagship_finedata 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --n_x_data 513 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg
run_job probe_resolve_v2 2400 python experiments/probe_resolve.py

echo "QUEUE Y COMPLETE $(date)" >> "$STATUS"
commit_results "queue_y_complete" 0
