# re-validate the mfqr auto engine WITH the matmul-precision pin
# (round-5 chip finding: unpinned one-hot/Gram GEMMs ran bf16 -> mean
# residual 5.1e+03; VERDICT next #1a wants fast+accurate at N300 before
# the N500 bar). Expect rel_err ~2e-3-class, mean_residual ~1e-6-class.
run_job mfqr_N300_auto_f32pin 6000 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 300 --N_instances 2 --leaf_target 512 --truth_N_xy 128 \
  --qr_impl auto --std_impl both
