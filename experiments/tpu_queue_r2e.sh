#!/bin/bash
# Round-2 queue E: final consolidated schedule (replaces queues C/D).
# Ordering puts every SHORT measurement before the open-ended 2048-instance
# sweep, which runs last and truncates gracefully at round end (its driver
# saves per-instance partials via IncrementalSaver):
#   1. darcy_N300_tshh   — VERDICT <25 s/instance check, tshh QR engine
#   2. srif_qr_probe     — tshh vs bhh vs bcgs TPU rates (engine decision)
#   3. front_rates_v2    — batched POTRF/QR rates at multifrontal front
#                          sizes (round-3 go/no-go data)
#   4. elliptic_N100_ctrl— controlled re-run for the 13.1 -> 46.3 s anomaly
#   5. darcy_N128_b8_v2  — batched 64-instance sweep (re-run; the original
#                          predated the truth-generator hoist)
#   6. darcy_1024_sweep  — reference instance count (cache pre-generated)
#   7. burgers_2048_sweep— reference instance count, fills remaining time
# Waits for the orphaned flagship python (pid as $1).
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
  echo -e "flagship_N800x100\trc=?\t(orphaned; see log)" >> "$STATUS"
  find data/sims -name '*.json*' -newermt "-4 hours" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
fi

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)"
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job darcy_N300_tshh    5400  python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1 --sqrt --phase_probe --mean_only --srif_qr_impl tshh
run_job srif_qr_probe_tshh 2400  python experiments/probe_srif_qr.py
run_job front_rates_v2     2400  python experiments/probe_front_rates.py
run_job elliptic_N100_ctrl 2400  python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt
run_job darcy_N128_b8_v2   7200  python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 128 --N_instances 64 --batch 8 --sqrt --grid 241
run_job darcy_1024_sweep   10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 128 --grid 241 --N_instances 1024 --truth_N_xy 64 --batch 8 --sqrt
run_job burgers_2048_sweep 21600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise

echo "QUEUE E COMPLETE $(date)" >> "$STATUS"
