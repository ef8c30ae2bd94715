# VERDICT r3 next #1: the 1e6-dof bar. Measured memory model says
# ~11 GB peak with flat layouts + offload 6 (mfqr_mem.py); auto engine
# keeps the top fronts on Householder QR.
run_job mfqr_N500_auto 9000 python experiments/darcy/solve_darcy_mfqr.py \
  --N_xy 500 --N_instances 1 --leaf_target 512 --truth_N_xy 64 \
  --qr_impl xla --std_impl mc
