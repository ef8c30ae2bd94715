# N300 NLL v4: pat_E now host-side under phase_split, uploaded per
# instance after the posterior factor is freed (sequential residency)
run_job darcy_N300_nll_v4 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split --nll
