# N300 NLL arm, THIRD attempt — now guaranteed on the fixed driver
# (own savename via params['nll']; E threaded as jit argument)
run_job darcy_N300_nll_v3 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split --nll
