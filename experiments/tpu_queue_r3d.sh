#!/bin/bash
# Round-3 queue A. Priorities (VERDICT r2 "Next round"):
#   1. mfqr ladder N64 -> N128 -> N300 -> N500 (1e6 dofs — the BASELINE
#      north-star "executes at any wall-clock" bar) + engine comparison
#   2. N300 calibration arm (--phase_split --nll): no committed artifact
#      with empty sqmahals/nlls again
#   3. Burgers collocation production table (both priors, nc 0..1000)
#   4. real-format .mat ingestion rehearsal
#   5. Burgers N_x=256 relay-envelope retry
#   6. reference-default 1024-instance Darcy N300 sweep (deadline-clamped,
#      resumable, sidecar partial commits)
# Advisor fixes vs r2aa: commits serialized via flock; result copies
# preserve relative paths (no same-name clobber); stamp captured BEFORE
# the find so files created mid-copy are not skipped.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_r3d.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_r3d_runner.log"
LOCK=/tmp/tpuq_r3d.lock
# leave slack for the driver's end-of-round bench.py
DEADLINE=${DEADLINE:-$(date -d "today 19:25 UTC" +%s 2>/dev/null || echo $(( $(date +%s) + 21000 )))}

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}
relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180; waited=$((waited + 180))
    [ "$waited" -gt 10800 ] && return 1
  done
  return 0
}
chip_idle_wait() {
  # one TPU job at a time: wait out any still-running experiment python
  # (e.g. the superseded r2aa queue's orphaned child)
  local waited=0
  while ps -eo cmd | grep -E "python (\S*/)?experiments/" \
      | grep -vE "JAX_PLATFORMS=cpu|--backend cpu|grep|gen_darcy" >/dev/null; do
    echo "=== [$(date +%H:%M:%S)] chip busy; waiting (${waited}s)" >> "$RLOG"
    sleep 60; waited=$((waited + 60))
    [ "$waited" -gt 7200 ] && return 1
  done
  return 0
}
commit_results() {
  (
    flock 9
    stamp_new=/tmp/tpuq_r3d_stamp_new
    touch "$stamp_new"
    find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
      -newer /tmp/tpuq_r3d_stamp -exec cp --parents {} "$OUT/" \; 2>/dev/null
    mv -f "$stamp_new" /tmp/tpuq_r3d_stamp
    git add "$OUT" >/dev/null 2>&1 || { sleep 5; git add "$OUT" >/dev/null 2>&1; }
    git commit -q -m "tpu queue r3d: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 \
      || { sleep 5; git commit -q -m "tpu queue r3d: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true; }
  ) 9>"$LOCK"
}
run_job() {
  local name="$1" tmo="$2"; shift 2
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 240 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
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
    [ "$left" -lt 240 ] && { echo -e "$name\trc=DEADLINE\t-" >> "$STATUS"; return 1; }
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

touch /tmp/tpuq_r3d_stamp
echo "=== [$(date +%H:%M:%S)] queue r3d start (deadline $(date -u -d @$DEADLINE 2>/dev/null || echo $DEADLINE))" >> "$RLOG"
chip_idle_wait || echo "=== chip_idle_wait timed out; proceeding" >> "$RLOG"
commit_results "aa_orphan_harvest" 0

# --- 1. multifrontal sqrt-QR ladder (BASELINE north-star) ---
run_job mfqr_N300 5400 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128
run_job mfqr_N300_cholqr 3600 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl cholqr
# the 1e6-dof bar: N_xy=500 -> 1001^2 = 1,002,001 dofs
run_job mfqr_N500_1e6dof 10800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 500 --N_instances 1 --leaf_target 512 --truth_N_xy 64

# --- 2. N300 calibration artifact (sqmahal + NLL filled) ---
run_job darcy_N300_nll 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split --nll

# --- 3. Burgers collocation production table ---
for prior in adv_diff product_matern; do
  for nc in 0 5 10 25 100 250 500 1000; do
    run_job colloc_${prior}_nc${nc} 2400 python \
      experiments/burgers/solve_burgers_gmrf_collocation.py \
      --N_basis 384 --n_t_data 51 --N_collocation $nc \
      --prior_type $prior --N_instances 5 --N_samples 30
  done
done

# --- 4. real-format .mat ingestion rehearsal (waits for the t128 cache) ---
if [ -f data/input_data/synthetic/darcy_g241_n1024_t128.npz ]; then
  env JAX_PLATFORMS=cpu python experiments/gen_darcy_mat.py \
    --cache data/input_data/synthetic/darcy_g241_n1024_t128.npz \
    --out piececonst_synth_r241_N1024_smooth1 \
    >> "$OUT/gen_darcy_mat.log" 2>&1
  run_job darcy_matfile_N64 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --datasetname piececonst_synth_r241_N1024_smooth1 \
    --N_xy 64 --grid 241 --N_instances 32 --sqrt --sqrt_prefactor off \
    --mean_only
else
  echo -e "darcy_matfile_N64\trc=NO_CACHE\t-" >> "$STATUS"
fi

# --- 5. Burgers N_x=256 relay-envelope retry (batch=2 stepwise) ---
run_job burgers_N256_batch2 3600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 256 --n_t_data 100 --N_instances 4 --sqrt --stepwise --warm_start \
  --damping --max_steps 12 --pad_block 128 --srif_solve pcg --batch 2

# --- 6. reference-default 1024-instance Darcy N300 sweep (resumable) ---
(
  while [ -f /tmp/tpuq_r3d_sweeping ]; do
    sleep 600
    [ -f /tmp/tpuq_r3d_sweeping ] || break
    commit_results "sweep1024 partial" periodic
  done
) &
SIDECAR=$!
touch /tmp/tpuq_r3d_sweeping
run_job darcy_N300_sweep1024 28800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1024 --truth_N_xy 128 --sqrt \
  --sqrt_prefactor off --mean_only
rm -f /tmp/tpuq_r3d_sweeping
wait "$SIDECAR" 2>/dev/null

echo "QUEUE R3D COMPLETE $(date)" >> "$STATUS"
commit_results "queue_r3d_complete" 0
