# Round-4 engine FIX arm: per-level hybrid (gram below, Householder top
# 3 levels) — expect rel_err ~2e-3 AND factorization well under the
# banded 25 s (the all-gram arm measured 5.5 s but lost the factor at
# the top fronts' condition)
run_job mfqr_N300_auto 4200 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl auto --std_impl both
