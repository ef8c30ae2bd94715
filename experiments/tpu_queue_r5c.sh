#!/bin/bash
# Round-5 queue C — relaunch after the VM restart killed r5b during its
# pending mfqr_N300_auto_f32pin arm (data/sims + input_data/synthetic
# wiped; truth caches regenerated deterministically from seed 0 by
# experiments/gen_truth_cache.py / gen_darcy_1024.py before/alongside
# this queue). Priority order = VERDICT r4 "next round" items still
# open: f32pin validation (next #1a), chen24 warm (<20 s bar, next #5),
# the 1e6-dof N500 bar (next #1b), flagship rescue (next #2), NLL split
# (next #3), .mat arm (next #6), sweep chunks (next #4).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_r5c.pid
OUT=results/tpu_queue
mkdir -p "$OUT" experiments/pending_r5
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_r5c_runner.log"
LOCK=/tmp/tpuq_r5c.lock
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}

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
commit_results() {
  (
    flock 9
    stamp_new=/tmp/tpuq_r5c_stamp_new
    touch "$stamp_new"
    find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
      -newer /tmp/tpuq_r5c_stamp -exec cp --parents {} "$OUT/" \; 2>/dev/null
    mv -f "$stamp_new" /tmp/tpuq_r5c_stamp
    git add "$OUT" >/dev/null 2>&1 || true
    git commit -q -m "tpu queue r5c: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true
  ) 9>"$LOCK"
}
run_pending() {
  for f in $(ls experiments/pending_r5/*.sh 2>/dev/null | sort); do
    echo "=== [$(date +%H:%M:%S)] pending arm: $f" >> "$RLOG"
    mv "$f" "$f.done"
    source "$f.done"
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
wait_for_file() {
  local f="$1" cap="${2:-3600}" waited=0
  until [ -f "$f" ]; do
    echo "=== [$(date +%H:%M:%S)] waiting for $f (${waited}s)" >> "$RLOG"
    sleep 120; waited=$((waited + 120))
    [ "$waited" -gt "$cap" ] && return 1
  done
  return 0
}

touch -d '1 hour ago' /tmp/tpuq_r5c_stamp
echo "=== [$(date +%H:%M:%S)] queue r5c start (deadline $DEADLINE)" >> "$RLOG"

# 1. mfqr auto engine + f32 matmul pin re-validation (the round-5 chip
#    finding); interrupted by the VM restart last time at the first
#    instance's mean phase (residual 2.388e-03 after refinement stall)
run_job mfqr_N300_auto_f32pin 5400 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl auto --std_impl both
run_pending

# 2. chen24 warm start on top of the measured stall fix (43.24 s / 14
#    steps); CPU N60 check: 9 -> 5 steps at identical err. Target <20 s.
run_job chen24_N1000_warm 2400 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --el_order 2 --sqrt --stepwise --warm_start
run_pending

# 3. THE 1e6-dof BAR: xla engine (reliability over rate), mc std,
#    ~10.9 GB corrected ledger, symbolic cache prebuilt
run_job mfqr_N500_xla 7800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 500 --N_instances 1 --leaf_target 512 --truth_N_xy 64 \
  --qr_impl xla --std_impl mc
run_pending

# 4. flagship Burgers N800x100 rescue (damped GN + warm start + pcg)
run_job flagship_rescue 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag
run_pending

# 5. Darcy N300 NLL via the 2-program residency split (t128 truth cache
#    shared with arm 1; CPU-verified bitwise == all-fused at N32)
run_job darcy_N300_nll_split 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --truth_N_xy 128 --sqrt \
  --sqrt_prefactor off --nll
run_pending

# 6. real-format .mat end-to-end (needs the 1024-instance cache the
#    background generator is writing)
if wait_for_file data/input_data/synthetic/darcy_g241_n1024_t128.npz 1800; then
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
fi
run_pending

# 7. reference-default sweep chunks fill remaining time (resumable)
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

echo "QUEUE R5C COMPLETE $(date)" >> "$STATUS"
commit_results "queue_r5c_complete" 0
