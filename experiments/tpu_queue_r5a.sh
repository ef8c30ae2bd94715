#!/bin/bash
# Round-5 queue A — encodes the round-4 postmortem:
#   * mfqr arms carry a ~35-50 min compile+setup overhead per process
#     (no persistent XLA cache through the relay): timeouts >= 6000 s,
#     symbolic caches prebuilt (data/cache/*.pkl) make repeats cheaper.
#   * NEVER kill a chip job mid-flight: 3 of 5 kills tonight wedged the
#     relay for 10-40 min. Use the pending-arm hook + natural timeouts.
#   * Order: short high-value arms FIRST, the resumable sweep fills gaps.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_r5a.pid
OUT=results/tpu_queue
mkdir -p "$OUT" experiments/pending_r5
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_r5a_runner.log"
LOCK=/tmp/tpuq_r5a.lock
DEADLINE=${DEADLINE:-$(( $(date +%s) + 26000 ))}

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
    stamp_new=/tmp/tpuq_r5a_stamp_new
    touch "$stamp_new"
    find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
      -newer /tmp/tpuq_r5a_stamp -exec cp --parents {} "$OUT/" \; 2>/dev/null
    mv -f "$stamp_new" /tmp/tpuq_r5a_stamp
    git add "$OUT" >/dev/null 2>&1 || true
    git commit -q -m "tpu queue r5a: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true
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
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  commit_results "$name" "$rc"
  return $rc
}

touch /tmp/tpuq_r5a_stamp
echo "=== [$(date +%H:%M:%S)] queue r5a start" >> "$RLOG"
chip_idle_wait || echo "=== chip_idle_wait timed out; proceeding" >> "$RLOG"
commit_results "r5a_start" 0

# 0. cheap on-chip Pallas smoke (VERDICT r4 #8): catches Mosaic/relay
#    regressions in ~2 min before the long arms commit to the chip
run_job pallas_smoke 1200 python experiments/probe_sweep_perf.py \
  --N 8 --bs 2048 --pallas_ops --sweeps pallas --quality

# 1. mfqr N300 auto: the engine-accuracy validation the r4 deadline cut
#    (expect rel_err ~2e-3, factorization << 25 s, mean_residual ~1e-6,
#    selinv==MC; symbolic cache present -> ~45 min total)
run_job mfqr_N300_auto 6000 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl auto --std_impl both

# 2. THE 1e6-dof BAR (VERDICT r3 #1): xla engine for reliability;
#    memory model says ~10.9 GB peak; symbolic cache prebuilt
run_job mfqr_N500_xla 10800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 500 --N_instances 1 --leaf_target 512 --truth_N_xy 64 \
  --qr_impl xla --std_impl mc

# 3. N300 NLL through the FUSED path (phase-split holds two factor-class
#    buffer sets across jit boundaries; the fused program lets XLA plan
#    liveness — darcy_N300_full_nopf ran fused rc=0)
run_job darcy_N300_nll_fused 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off --nll

# 4. flagship re-measure with the variance rescue live (VERDICT r3 #5)
run_job flagship_rescue 5400 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --warm_start \
  --damping --max_steps 25 --pad_block 128 --srif_solve pcg --gn_diag

# 5. real-format .mat end-to-end (VERDICT r3 #7a)
if [ ! -f data/input_data/Darcy_241/piececonst_synth_r241_N1024_smooth1.mat ]; then
  env JAX_PLATFORMS=cpu python experiments/gen_darcy_mat.py \
    --cache data/input_data/synthetic/darcy_g241_n1024_t128.npz \
    --out piececonst_synth_r241_N1024_smooth1 \
    >> "$OUT/gen_darcy_mat.log" 2>&1 || true
fi
run_job darcy_matfile_N64 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --datasetname piececonst_synth_r241_N1024_smooth1 \
  --N_xy 64 --grid 241 --N_instances 32 --sqrt --sqrt_prefactor off \
  --mean_only

# 6. t600 same-yardstick pair (VERDICT r3 #9; t600 cache exists)
run_job darcy_N300_banded_t600 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --truth_N_xy 600 --sqrt \
  --sqrt_prefactor off --mean_only
run_job mfqr_N300_t600 6000 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 600 \
  --qr_impl auto --std_impl selinv

# 7. Burgers N_x=256 envelope retry (VERDICT r3 #7b)
run_job burgers_N256_batch2 4800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 256 --n_t_data 100 --N_instances 4 --sqrt --stepwise --warm_start \
  --damping --max_steps 12 --pad_block 128 --srif_solve pcg --batch 2

# 8. reference-default sweep: resumable chunks with pending-arm hook
#    fill ALL remaining time
SWEEP_DONE=0
while :; do
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && break
  for f in $(ls experiments/pending_r5/*.sh 2>/dev/null | sort); do
    echo "=== [$(date +%H:%M:%S)] pending arm: $f" >> "$RLOG"
    source "$f"
    mv "$f" "$f.done"
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 300 ] && break 2
  done
  if [ "$SWEEP_DONE" -eq 0 ]; then
    run_job darcy_N300_sweep1024 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
      --N_xy 300 --grid 241 --N_instances 1024 --truth_N_xy 128 --sqrt \
      --sqrt_prefactor off --mean_only
    [ $? -eq 0 ] && SWEEP_DONE=1
  else
    sleep 120
  fi
done

echo "QUEUE R5A COMPLETE $(date)" >> "$STATUS"
commit_results "queue_r5a_complete" 0
