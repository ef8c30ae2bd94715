#!/bin/bash
# Round-2 queue N: bhh1 engine arms + N300 solve decomposition + the
# 64-instance N300 reference-config sweep.
#
# Informed by queue L/M (RESULTS.md):
#   - bhh1 (single-pass blocked-Householder BGS) hits the Householder
#     accuracy floor on the N64 CPU harness (9.2122e-7) and measured
#     ~19.9 TF/s ACTUAL flops at the N300 window shape (probe_srif_qr
#     "bhh p512 noreorth": 131.9 ms/window vs xla 172.5 in-scan) —
#     expect N300 cond+mean 28.95 -> ~25 s.
#   - probe_resolve decomposes the 6.76 s N300 resolve(delta): ELL
#     matvec/rmatvec vs TRSV-form vs GEMM-form packed solves.
#   - The 64-instance N300 sweep is the committed accuracy-distribution
#     record at the reference Darcy config (241x241 data, N_xy=300).
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue N: waiting for queue M + running TPU jobs" \
  >> "$OUT/queue_n_runner.log"
while [ -n "$(ps -eo cmd | grep -E '[t]pu_queue_r2m.sh|[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue N: starting schedule" >> "$OUT/queue_n_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_n_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_n_runner.log"
}

# 1. N300 rate with bhh1 (steady-state phase probe, prefactor off).
run_job darcy_N300_nopf_bhh1 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_probe --mean_only --srif_qr_impl bhh1

# 2. N300 accuracy with bhh1 (expect ~8.5e-5 like xla/bcgs4).
run_job darcy_N300_bhh1_acc 2400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --mean_only --srif_qr_impl bhh1

# 3. Elliptic N100 with bhh1 — the engine-accuracy stress config
#    (xla: 6.88e-9 in 15.7 s; bcgs4 failed here at 3.4e-2).
run_job elliptic_N100_bhh1 1800 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt --srif_qr_impl bhh1

# 4. N300 mean-solve decomposition (the 6.76 s resolve delta).
run_job probe_resolve 2400 python experiments/probe_resolve.py

# 5. THE COMMITTED RECORD: 64-instance sweep at the reference Darcy
#    config (241x241 grid data, N_xy=300 mesh), mean-only, xla engine.
run_job darcy_N300_sweep64 7200 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 64 --sqrt --sqrt_prefactor off \
  --mean_only

# 6. chen24 N1000 with bhh1 (xla: 8.90e-5 in 126.8 s).
run_job chen24_N1000_bhh1 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise --srif_qr_impl bhh1

echo "QUEUE N COMPLETE $(date)" >> "$STATUS"
