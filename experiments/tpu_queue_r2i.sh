#!/bin/bash
# Round-2 queue I: relaunch of queue H after the second environment reboot
# (04:06 UTC) killed the runner; the relay is down at launch time, so this
# runner first POLLS the relay (bench.relay_alive subprocess probe — device
# enumeration hangs, it does not error, while the relay process is dead)
# and starts the measurement schedule the moment it recovers.
# Job list == queue H (see tpu_queue_r2h.sh for rationale):
#   1. chen24_N1000_f     — cond-sub re-measurement (expect ~155 s vs 383)
#   2. darcy_N300_pf      — N300 f32 re-measurement (413 fix + prefactor)
#   3. srif_qr_probe_tf32 — bhh/bcgs2 tf32 trailing-update rates
#   4. darcy_N300_tf32    — N300 with tensorfloat32 QR trailing updates
#   5. flagship_warm      — N800x100, fold + warm start + plateau stop
#   6. burgers_2048_warm  — full sweep relaunch, fills remaining time
set -u
cd /root/repo
echo $$ > /tmp/tpuq.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"

echo "=== [$(date +%H:%M:%S)] queue I: waiting for relay..." >> "$OUT/queue_i_runner.log"
while true; do
  if python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from bench import relay_alive
sys.exit(0 if relay_alive(timeout=180) else 1)
EOF
  then break; fi
  echo "=== [$(date +%H:%M:%S)] relay still down, retry in 120s" >> "$OUT/queue_i_runner.log"
  sleep 120
done
echo "=== [$(date +%H:%M:%S)] relay UP — starting schedule" >> "$OUT/queue_i_runner.log"

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$OUT/queue_i_runner.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$OUT/queue_i_runner.log"
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job chen24_N1000_f 5400 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise
run_job darcy_N300_pf 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only
run_job srif_qr_probe_tf32 2400 python experiments/probe_srif_qr.py
run_job darcy_N300_tf32 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only \
  --srif_precision tensorfloat32
run_job flagship_warm 10800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --max_steps 25 --pad_block 128
run_job burgers_2048_warm 43200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise \
  --warm_start --max_steps 12 --sub_dtype f32

echo "QUEUE I COMPLETE $(date)" >> "$STATUS"
