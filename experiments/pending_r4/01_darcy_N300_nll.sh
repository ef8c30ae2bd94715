# VERDICT r3 next #4: N300 calibration artifact with filled sqmahal/NLL.
# The r3d arm OOM'd at ps_eval trace time (captured eval operator
# re-materialized as an MLIR constant); E now threads as a jit argument.
run_job darcy_N300_nll 5400 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --N_xy 300 --grid 241 --N_instances 2 --sqrt --sqrt_prefactor off \
  --phase_split --nll
