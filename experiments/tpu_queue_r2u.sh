#!/bin/bash
# Round-2 queue U: chains after queue T.
#   1. sweep64 retry — queue R's darcy_N300_sweep64 generates its 64
#      N300-truth reference solutions on the one-core host (~1.5 h)
#      inside the job's 2 h timeout; the retry resumes from the dataset
#      cache + IncrementalSaver records and completes the committed
#      reference-config record.
#   2. probe_resolve rerun — the fixed script (buffer frees + donated
#      conversion) captures the TRSV vs GEMM substitution timings the
#      queue-R run OOMed before reaching.
#   3. darcy_N300_refine2 — probe --refine_iters 2 accuracy + phase time
#      (the refined mean's default 4 iterations cost ~2.8 s of the 6.8 s
#      resolve; the flag help claims 2 reaches the f64 floor at N300).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_u.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue U: waiting for queue T" \
  >> "$OUT/queue_u_runner.log"
while ! grep -q "QUEUE T COMPLETE" "$STATUS"; do
  sleep 120
done
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue U: starting schedule" >> "$OUT/queue_u_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_u_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_u_runner.log"
}

run_job darcy_N300_sweep64_v2 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only

run_job probe_resolve_v2 2400 python experiments/probe_resolve.py

run_job darcy_N300_refine2 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --refine_iters 2

run_job darcy_N300_refine2_probe 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --refine_iters 2

echo "QUEUE U COMPLETE $(date)" >> "$STATUS"
