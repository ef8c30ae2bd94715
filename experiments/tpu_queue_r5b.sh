#!/bin/bash
# Round-5 queue B — replaces r5a's runner (killed between... during its
# arm #1, which survives as an orphan; this runner first waits for the
# chip to go idle). Fix vs r5a: arm timeout budgets summed to ~45600s
# against a ~24000s deadline, so the tail arms + pending hook could
# never fire. v2 orders by VERDICT priority with realistic ceilings and
# moves the pending hook between EVERY arm.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_r5b.pid
OUT=results/tpu_queue
mkdir -p "$OUT" experiments/pending_r5
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_r5b_runner.log"
LOCK=/tmp/tpuq_r5b.lock
DEADLINE=${DEADLINE:-$(( $(date +%s) + 22000 ))}

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
  local waited=0
  while ps -eo cmd | grep -E "experiments/[a-z0-9_/]+\.py" \
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
    stamp_new=/tmp/tpuq_r5b_stamp_new
    touch "$stamp_new"
    find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
      -newer /tmp/tpuq_r5b_stamp -exec cp --parents {} "$OUT/" \; 2>/dev/null
    mv -f "$stamp_new" /tmp/tpuq_r5b_stamp
    git add "$OUT" >/dev/null 2>&1 || true
    git commit -q -m "tpu queue r5b: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true
  ) 9>"$LOCK"
}
run_pending() {
  for f in $(ls experiments/pending_r5/*.sh 2>/dev/null | sort); do
    echo "=== [$(date +%H:%M:%S)] pending arm: $f" >> "$RLOG"
    source "$f"
    mv "$f" "$f.done"
  done
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
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  commit_results "$name" "$rc"
  return $rc
}

# stamp exists from the r5a runner; create if missing, but do NOT reset
# (the orphaned mfqr arm's outputs must stay newer-than)
[ -f /tmp/tpuq_r5a_stamp ] && cp -p /tmp/tpuq_r5a_stamp /tmp/tpuq_r5b_stamp
[ -f /tmp/tpuq_r5b_stamp ] || touch -d '1 hour ago' /tmp/tpuq_r5b_stamp
echo "=== [$(date +%H:%M:%S)] queue r5b start (deadline $DEADLINE)" >> "$RLOG"
# wait for the orphaned r5a arm #1 (mfqr_N300_auto) to finish
chip_idle_wait || echo "=== chip_idle_wait timed out; proceeding" >> "$RLOG"
echo -e "mfqr_N300_auto\trc=orphan-see-log\t-" >> "$STATUS"
commit_results "mfqr_N300_auto_orphan_pickup" 0

# 1. chen24 Burgers stall-fix re-measure (VERDICT r4 weak #3 / next #5):
#    stall detection stops the 20 wasted floor steps; expect ~13 steps
run_job chen24_N1000_stall 2400 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --el_order 2 --sqrt --stepwise
run_pending

# 2. chen24 per-phase probe at the same config: decompose the 3.3 s/step
run_job chen24_N1000_phases 2700 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --el_order 2 --sqrt --stepwise --probe_phases
run_pending

# 3. N300 NLL through the FUSED path (VERDICT next #3; the 2-program
#    residency split design — program A fused posterior, program B
#    E-conditioning + sqmahal after the posterior factor frees)
run_job darcy_N300_nll_fused 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off --nll
run_pending

# 4. THE 1e6-dof BAR (VERDICT next #1): xla engine for reliability;
#    memory model ~10.9 GB peak; symbolic cache prebuilt
run_job mfqr_N500_xla 9000 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 500 --N_instances 1 --leaf_target 512 --truth_N_xy 64 \
  --qr_impl xla --std_impl mc
run_pending

# 5. flagship re-measure with damped GN + variance rescue (VERDICT #2)
run_job flagship_rescue 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag
run_pending

# 6. real-format .mat end-to-end (VERDICT next #6)
if [ ! -f data/input_data/Darcy_241/piececonst_synth_r241_N1024_smooth1.mat ]; then
  env JAX_PLATFORMS=cpu python experiments/gen_darcy_mat.py \
    --cache data/input_data/synthetic/darcy_g241_n1024_t128.npz \
    --out piececonst_synth_r241_N1024_smooth1 \
    >> "$OUT/gen_darcy_mat.log" 2>&1 || true
fi
run_job darcy_matfile_N64 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --datasetname piececonst_synth_r241_N1024_smooth1 \
  --N_xy 64 --grid 241 --N_instances 32 --sqrt --sqrt_prefactor off \
  --mean_only
run_pending

# 7. official bench capture (413-fixed secondaries + Pallas arm)
run_job bench_midround_r5 2400 python bench.py
cp -f results/bench_tpu_last.json "$OUT/bench_midround_r5.json" 2>/dev/null || true
run_pending

# 8. t600 same-yardstick pair (VERDICT r3 #9 carryover)
run_job darcy_N300_banded_t600 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --truth_N_xy 600 --sqrt \
  --sqrt_prefactor off --mean_only
run_pending
run_job mfqr_N300_t600 4800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 600 \
  --qr_impl auto --std_impl selinv
run_pending

# 9. Burgers N_x=256 envelope retry
run_job burgers_N256_batch2 4800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 256 --n_t_data 100 --N_instances 4 --sqrt --stepwise --warm_start \
  --damping --max_steps 12 --pad_block 128 --srif_solve pcg --batch 2
run_pending

# 10. reference-default sweep chunks + pending hook fill remaining time
while :; do
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && break
  run_pending
  run_job darcy_N300_sweep1024 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 1024 --truth_N_xy 128 --sqrt \
    --sqrt_prefactor off --mean_only
  rc=$?
  [ $rc -eq 0 ] && { run_pending; sleep 120; }
done

echo "QUEUE R5B COMPLETE $(date)" >> "$STATUS"
commit_results "queue_r5b_complete" 0
