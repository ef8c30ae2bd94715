#!/bin/bash
# Round-2 TPU measurement queue (reconstructed after the VM reboot wiped
# /tmp/tpu_queue.py — see docs/RELAY_FAULT_REPORT.md addendum).
# Runs the queued jobs SERIALLY (one TPU job at a time) and copies logs +
# fresh result JSONs into results/tpu_queue/ so the round-end auto-commit
# captures them unattended.
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
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
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)"
  # snapshot any result JSONs written by the job
  find data/sims -name '*.json' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

# probes first: their numbers steer this round's kernel work
run_job srif_qr_probe      2400  python experiments/probe_srif_qr.py
run_job front_rates        3600  python experiments/probe_front_rates.py
run_job elliptic_N100      2400  python experiments/chen24/elliptic_chen24.py --N_el_xy 100 --sqrt
run_job chen24_N1000       5400  python experiments/chen24/burgers_chen24.py --N_x 1000 --sqrt --stepwise
run_job darcy_N300_probe   7200  python experiments/darcy/solve_darcy_gmrf_fem.py --N_xy 300 --grid 241 --N_instances 1 --sqrt --phase_probe --mean_only
run_job darcy_N300_full3   10800 python experiments/darcy/solve_darcy_gmrf_fem.py --N_xy 300 --grid 241 --N_instances 3 --sqrt
run_job darcy_N128_b8      7200  python experiments/darcy/solve_darcy_gmrf_fem.py --N_xy 128 --N_instances 64 --batch 8 --sqrt
run_job flagship_N800x100  14400 python experiments/burgers/solve_burgers_gmrf_fem.py --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --damping --pad_block 128
run_job burgers_2048_sweep 21600 python experiments/burgers/solve_burgers_gmrf_fem.py --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise

echo "QUEUE COMPLETE $(date)" >> "$STATUS"
