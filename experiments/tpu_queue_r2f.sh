#!/bin/bash
# Round-2 queue F: post-fold/post-sub_dtype TPU schedule.
# Context (RESULTS.md round 2 continued):
#  - periodic seam fold fix (problems/burgers.py): Burgers GN residual was
#    losing the seam element's flux -> N64 instance rel_err 0.198 -> 0.049,
#    N200x100 mean 4.69e-2 -> 1.93e-2 on CPU. All queue-E Burgers-sweep
#    numbers are superseded.
#  - sub_dtype="cond" (ops/refine.py): unconditional f64 substitution was
#    the 2.5-4.3x per-step regression (chen24 N1000 155->383 s, elliptic
#    N100 13->56 s). Re-measure both.
#   1. elliptic_N100_f   — regression check with the cond substitution
#   2. chen24_N1000_f    — same, ST full-offdiag path
#   3. darcy_N300_pf     — N300 re-measurement (413 fix + split windows +
#                          SRIF prefactor; VERDICT <25 s target)
#   4. flagship_warm     — N800x100 with fold + forward-march warm start
#   5. burgers_2048_warm — full-sweep relaunch on the fixed residual
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
  find data/sims -name '*.json*' -newermt "-$((dt + 60)) seconds" 2>/dev/null | while read -r f; do
    cp "$f" "$OUT/$(echo "${f#data/sims/}" | tr / _)"
  done
}

run_job elliptic_N100_f 2400 python experiments/chen24/elliptic_chen24.py \
  --N_el_xy 100 --sqrt
run_job chen24_N1000_f 3600 python experiments/chen24/burgers_chen24.py \
  --N_x 1000 --sqrt --stepwise
run_job darcy_N300_pf 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --phase_probe --mean_only
run_job flagship_warm 10800 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 800 --n_t_data 100 --N_instances 3 --sqrt --stepwise \
  --warm_start --max_steps 20 --pad_block 128
run_job burgers_2048_warm 43200 python experiments/burgers/solve_burgers_gmrf_fem.py \
  --N_x 128 --n_t_data 100 --N_instances 2048 --batch 4 --sqrt --stepwise \
  --warm_start --max_steps 12 --sub_dtype f32

echo "QUEUE F COMPLETE $(date)" >> "$STATUS"
