#!/bin/bash
# Round-2 queue C: merged replacement for queue A's tail + queue B,
# re-prioritized for the remaining round wall-clock. Ordering rationale:
#   1. flagship N800x100 (VERDICT item 2's last open config)
#   2. Darcy N300 single-instance phase probe with the tshh QR engine
#      (VERDICT item 3's < 25 s/instance check; the two earlier attempts
#      died on the relay 413 — fixed by threading the sqrt plan through
#      the jit signature)
#   3. QR-engine + front-rate probes (steer round-3 kernel work)
#   4. Burgers 2048-instance sweep last: it fills whatever time remains
#      and saves per-instance partials (IncrementalSaver), so a round-end
#      truncation still yields committed data.
# Takes over from the killed queue A runner: waits for its orphaned
# darcy_N128_b8 job (one TPU job at a time).
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

# wait for the orphaned N128_b8 python (pid passed as $1) to finish
PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
  echo -e "darcy_N128_b8\trc=?\t(orphaned; see log)" >> "$STATUS"
  find data/sims -name '*.json' -newermt "-4 hours" 2>/dev/null | while read -r f; do
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

run_job flagship_N800x100  10800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise --damping --pad_block 128
run_job darcy_N300_tshh    5400  python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 1 --sqrt --phase_probe --mean_only --srif_qr_impl tshh
run_job srif_qr_probe_tshh 2400  python experiments/probe_srif_qr.py
run_job front_rates_v2     2400  python experiments/probe_front_rates.py
run_job burgers_2048_sweep 21600 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise

echo "QUEUE C COMPLETE $(date)" >> "$STATUS"
