# reproducibility pair, second run (same config as 02)
run_job mfqr_N300_gram_b 4800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl gram --std_impl both
