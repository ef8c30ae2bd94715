#!/bin/bash
# Round-2 queue X: chains after queue W.
#   1. darcy_N300_full_nopf — fused FULL posterior (mean+std+sample) with
#      --sqrt_prefactor off: the queue-L OOM (18.83 GiB) ran with the
#      prefactor AUTO-ON (~5 GiB resident); without it the fused program
#      may simply fit, making --phase_split unnecessary at N300 (the
#      psplit arm OOMed on the factor-export copy: scan-internal +
#      output buffers of the 5.33 GiB packed R coexist).
#   2. darcy_N300_full_nopf_nll — same + --nll if arm 1 fits (needs the
#      second conditioning factor; sequential in the fused program).
set -u
cd /root/repo
echo $$ > /tmp/tpuq_x.pid
OUT=results/tpu_queue
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
RLOG="$OUT/queue_x_runner.log"

probe_relay() {
  timeout 300 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" 2>/dev/null | grep -q 16777216
}
relay_wait() {
  local waited=0
  until probe_relay; do
    echo "=== [$(date +%H:%M:%S)] relay down; waiting (${waited}s)" >> "$RLOG"
    sleep 180; waited=$((waited + 180))
    [ "$waited" -gt 21600 ] && return 1
  done
}
run_job() {
  local name="$1" tmo="$2"; shift 2
  relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; return 1; }
  echo "=== [$(date +%H:%M:%S)] $name: $*" | tee -a "$OUT/$name.log" >> "$RLOG"
  local t0=$SECONDS
  timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  if [ "$rc" -ne 0 ] && ! probe_relay; then
    relay_wait || { echo -e "$name\trc=RELAY_DOWN\t-" >> "$STATUS"; return 1; }
    t0=$SECONDS
    timeout "$tmo" "$@" >> "$OUT/$name.log" 2>&1
    rc=$? dt=$((SECONDS - t0))
  fi
  echo -e "$name\trc=$rc\t${dt}s" >> "$STATUS"
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc (${dt}s)" >> "$RLOG"
  return $rc
}

echo "=== [$(date +%H:%M:%S)] queue X: waiting for queue W" >> "$RLOG"
while ! grep -q "QUEUE W COMPLETE" "$STATUS"; do sleep 120; done
while [ -n "$(ps -eo cmd | grep -E '[s]olve_burgers_gmrf_fem|[b]urgers_chen24|[s]olve_darcy_gmrf_fem|[e]lliptic_chen24|[p]robe_resolve|[p]robe_srif_qr|[b]ench.py' || true)" ]; do
  sleep 60
done
echo "=== [$(date +%H:%M:%S)] queue X: starting" >> "$RLOG"

run_job darcy_N300_full_nopf 3600 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off
FULL_RC=$?

if [ "$FULL_RC" -eq 0 ]; then
  run_job darcy_N300_full8 10800 python experiments/darcy/solve_darcy_gmrf_fem.py \
    --N_xy 300 --grid 241 --N_instances 8 --sqrt --sqrt_prefactor off
fi

echo "QUEUE X COMPLETE $(date)" >> "$STATUS"
