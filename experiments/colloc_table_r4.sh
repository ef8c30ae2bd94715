#!/bin/bash
# Round-4 Burgers collocation production table (VERDICT r3 next #4):
# both priors x nc in {0,5,10,25,100,250,500,1000}, 5 instances, 30
# samples — the analog of `_research/burgers_collocation_plot.jl:25,41-45`
# with filled sqmahal/NLL arrays. Runs ENTIRELY on the host CPU
# (nice 19) concurrently with the chip queue; per-arm JSONs are saved by
# the driver and harvested by the r4a queue's commit sidecar.
# Arm order interleaves priors and spreads nc so a deadline cut still
# leaves a usable table.
set -u
cd /root/repo
echo $$ > /tmp/colloc_r4.pid
OUT=results/colloc_r4
mkdir -p "$OUT"
for nc in 0 100 1000 10 250 5 500 25; do
  for prior in adv_diff product_matern; do
    name="colloc_${prior}_nc${nc}"
    if ls data/sims/burgers/gmrf-collocation/*N_collocation=${nc}_*prior_type=${prior}*.json >/dev/null 2>&1; then
      # probe already produced this combination
      n_have=$(python - "$nc" "$prior" <<'EOF'
import glob, json, sys
nc, prior = sys.argv[1], sys.argv[2]
fs = glob.glob(f"data/sims/burgers/gmrf-collocation/*N_collocation={nc}_*prior_type={prior}*.json")
n = 0
for f in fs:
    try:
        n = max(n, len(json.load(open(f)).get("rel_errs", [])))
    except Exception:
        pass
print(n)
EOF
)
      [ "${n_have:-0}" -ge 5 ] && { echo "skip $name (have $n_have)"; continue; }
    fi
    echo "=== [$(date -u +%H:%M:%S)] $name"
    nice -n 19 timeout 5400 python experiments/burgers/solve_burgers_gmrf_collocation.py \
      --backend cpu --N_basis 384 --n_t_data 51 --N_collocation "$nc" \
      --prior_type "$prior" --N_instances 5 --N_samples 30 \
      > "$OUT/$name.log" 2>&1
    echo "=== [$(date -u +%H:%M:%S)] $name rc=$?"
  done
done
echo "COLLOC TABLE COMPLETE $(date -u)"
