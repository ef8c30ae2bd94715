# VERDICT r3 next #2 + #6: mfqr N300 with the round-4 all-GEMM gram
# engine + flat operand layouts; run TWICE back-to-back (separate arm 03)
# for the reproducibility pair. Target: factorization < 25 s/instance.
run_job mfqr_N300_gram 4800 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl gram --std_impl both
