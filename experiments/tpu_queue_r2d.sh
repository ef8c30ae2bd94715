#!/bin/bash
# Round-2 queue D: the reference-instance-count Darcy sweep (VERDICT item 4:
# the reference iterates 1024 instances per run, solve_darcy_gmrf-fem.jl:210).
# Solver mesh N_xy=128 (66k dofs); truth fidelity t64 — full N300 truth
# generation takes days on this one-core host (measured 129 s/instance),
# so the sweep demonstrates reference-scale INSTANCE THROUGHPUT with the
# accuracy floor set by the coarser truth (labeled as such in RESULTS.md).
# Waits for: queue C runner (pid in /tmp/tpuq.pid) AND the dataset cache
# written by experiments/gen_darcy_1024.py.
set -u
cd /root/repo
PRIMARY_PID=$(cat /tmp/tpuq.pid 2>/dev/null || echo "")
if [ -n "$PRIMARY_PID" ]; then
  while kill -0 "$PRIMARY_PID" 2>/dev/null; do sleep 60; done
fi
echo $$ > /tmp/tpuq.pid
CACHE=data/input_data/synthetic/darcy_g241_n1024_t64.npz
for _ in $(seq 1 120); do
  [ -f "$CACHE" ] && break
  sleep 60
done
if [ ! -f "$CACHE" ]; then
  echo "queue D: dataset cache never appeared; aborting" >> results/tpu_queue/status.tsv
  exit 1
fi
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

# controlled elliptic re-run first (idle host): resolves whether the
# queue's 13.1 -> 46.3 s elliptic N100 wall-clock regression was real or
# contention (RESULTS.md footnote)
run_job elliptic_N100_ctrl 2400 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt

# re-run of queue A's darcy_N128_b8: the original started before the
# truth-generator hoist landed and would have burned its whole timeout in
# host-side dataset generation (64 x 129 s); with the hoisted generator
# the same dataset builds in ~10 min
run_job darcy_N128_b8_v2 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 128 --N_instances 64 --batch 8 --sqrt --grid 241

run_job darcy_1024_sweep 21600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 128 --grid 241 --N_instances 1024 --truth_N_xy 64 --batch 8 --sqrt

echo "QUEUE D COMPLETE $(date)" >> "$STATUS"
