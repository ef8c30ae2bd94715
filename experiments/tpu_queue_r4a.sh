#!/bin/bash
# Round-4 queue A. Priorities (VERDICT r3 "Next round"):
#   3. reference-default 1024-instance Darcy N300 sweep AT QUEUE HEAD,
#      in resumable chunks (IncrementalSaver), with a pending-arm hook:
#      short chip arms dropped into experiments/pending_r4/*.sh run
#      between sweep chunks (NLL fix re-run, mfqr N500 retry, flagship
#      rescue re-measure, matfile arm, mfqr repro, engine probes).
# Chunked execution bounds recompile overhead to ~3-5% while letting the
# round's other chip arms interleave without abandoning the sweep.
set -u
cd /root/repo
echo $$ > /tmp/tpuq_r4a.pid
OUT=results/tpu_queue
mkdir -p "$OUT" experiments/pending_r4
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_r4a_runner.log"
LOCK=/tmp/tpuq_r4a.lock
# leave slack for the driver's end-of-round bench.py
DEADLINE=${DEADLINE:-$(date -d "tomorrow 04:40 UTC" +%s 2>/dev/null || echo $(( $(date +%s) + 26000 )))}

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
  # (interpreter-agnostic match per ADVICE r3)
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
    stamp_new=/tmp/tpuq_r4a_stamp_new
    touch "$stamp_new"
    find data/sims \( -name '*.json' -o -name '*.partial.jsonl' \) \
      -newer /tmp/tpuq_r4a_stamp -exec cp --parents {} "$OUT/" \; 2>/dev/null
    mv -f "$stamp_new" /tmp/tpuq_r4a_stamp
    git add "$OUT" >/dev/null 2>&1 || { sleep 5; git add "$OUT" >/dev/null 2>&1; }
    git commit -q -m "tpu queue r4a: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 \
      || { sleep 5; git commit -q -m "tpu queue r4a: $1 (rc=$2)" -- "$OUT" >/dev/null 2>&1 || true; }
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
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && ! probe_relay; then
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

touch /tmp/tpuq_r4a_stamp
echo "=== [$(date +%H:%M:%S)] queue r4a start (deadline $(date -u -d @$DEADLINE 2>/dev/null || echo $DEADLINE))" >> "$RLOG"
chip_idle_wait || echo "=== chip_idle_wait timed out; proceeding" >> "$RLOG"
commit_results "r4a_start_harvest" 0

SWEEP_DONE=0
CHUNK=0
while :; do
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 300 ] && break
  # pending arms first (dropped in by the builder during the round)
  for f in $(ls experiments/pending_r4/*.sh 2>/dev/null | sort); do
    echo "=== [$(date +%H:%M:%S)] pending arm: $f" >> "$RLOG"
    source "$f"
    mv "$f" "$f.done"
    left=$(( DEADLINE - $(date +%s) ))
    [ "$left" -lt 300 ] && break 2
  done
  if [ "$SWEEP_DONE" -eq 0 ]; then
    CHUNK=$((CHUNK + 1))
    run_job darcy_N300_sweep1024 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
      --N_xy 300 --grid 241 --N_instances 1024 --truth_N_xy 128 --sqrt \
      --sqrt_prefactor off --mean_only
    rc=$?
    if [ "$rc" -eq 0 ]; then
      SWEEP_DONE=1
      echo "=== [$(date +%H:%M:%S)] SWEEP COMPLETE after chunk $CHUNK" >> "$RLOG"
    fi
  else
    sleep 120
  fi
done

echo "QUEUE R4A COMPLETE $(date)" >> "$STATUS"
commit_results "queue_r4a_complete" 0
