#!/bin/bash
# Round-2 queue AA: consolidated resume after the VM reboot killed
# queues Y (mid-tail) and Z (still waiting on Y).
# Order: short decision probes first, then posterior/flagship arms,
# then the deadline-clamped incremental 1024-instance Darcy N300 sweep
# (the reference's full default config,
# /root/reference/scripts/darcy/solve_darcy_gmrf-fem.jl:36-49).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_aa.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_aa_runner.log"
# hard deadline (epoch s): leave slack for the driver's end-of-round
# bench.py run (bench waits at most 1800 s for queue jobs)
DEADLINE=${DEADLINE:-$(( $(date +%s) + 36000 ))}

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}
relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180; waited=$((waited + 180))
    [ "$waited" -gt 14400 ] && return 1
  done
  return 0
}
commit_results() {
  find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
    -newer /tmp/tpuq_aa_stamp -exec cp {} "$OUT/" \; 2>/dev/null
  touch /tmp/tpuq_aa_stamp
  git add "$OUT" >/dev/null 2>&1 || { sleep 7; git add "$OUT" >/dev/null 2>&1; }
  git commit -q -m "tpu queue AA: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 \
    || { sleep 7; git commit -q -m "tpu queue AA: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true; }
}
run_job() {
  local name="$1" tmo="$2"; shift 2
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
  echo "=== [$(date +%H:%M:%S)] $name (tmo=${tmo}s): $*" | tee -a "$OUT/$name.log" >> "$RLOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ] && ! probe_relay; then
    echo "=== [$(date +%H:%M:%S)] $name rc=$rc with relay down; retrying" >> "$RLOG"
    relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; commit_results "$name" RELAY_DOWN; return 1; }
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 300 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
    [ "$tmo" -gt "$left" ] && tmo=$left
    t0=$SECONDS
    timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
    rc=$? dt=$((SECONDS - t0))
  fi
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  commit_results "$name" "$rc"
  return $rc
}

touch /tmp/tpuq_aa_stamp
echo "=== [$(date +%H:%M:%S)] queue AA start (deadline $(date -u -d @$DEADLINE 2>/dev/null || echo $DEADLINE))" >> "$RLOG"

# --- lost queue-Y tail, short arms first ---
run_job front_rates_v3 5400 python experiments/probe_front_rates.py
run_job probe_multifrontal 5400 python experiments/probe_multifrontal.py \
  --sizes 32 64 128
run_job probe_resolve_v2 2400 python experiments/probe_resolve.py
run_job darcy_N300_refine2_y 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --refine_iters 2
run_job darcy_N300_refine2_probe_y 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --refine_iters 2
run_job darcy_N300_full8 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 8 --sqrt --sqrt_prefactor off
run_job flagship_finedata 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --n_x_data 513 --N_instances 3 --sqrt --stepwise \
  --warm_start --damping --max_steps 25 --pad_block 128 --srif_solve pcg

# --- queue-Z payload: the reference-default full-dataset sweep ---
# sidecar: commit the 1024-sweep's partial rows every 10 min
(
  while [ -f /tmp/tpuq_aa_sweeping ]; do
    sleep 600
    [ -f /tmp/tpuq_aa_sweeping ] || break
    commit_results "sweep1024 partial" periodic
  done
) &
SIDECAR=$!
touch /tmp/tpuq_aa_sweeping
run_job darcy_N300_sweep1024 28800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1024 --sqrt --sqrt_prefactor off \
  --mean_only
rm -f /tmp/tpuq_aa_sweeping
wait "$SIDECAR" 2>/dev/null

echo "QUEUE AA COMPLETE $(date)" >> "$STATUS"
commit_results "queue_aa_complete" 0
