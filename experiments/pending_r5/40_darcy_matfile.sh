# real-format .mat end-to-end (VERDICT next #6, staged two rounds):
# prove the scipy-.mat loader path with a quick N64 mean-only run.
# Promoted ahead of the heavy NLL arm via the pending hook — the .mat
# gen runs CPU-side first (1024-instance cache finished at 18:07).
if [ ! -f data/input_data/Darcy_241/piececonst_synth_r241_N1024_smooth1.mat ]; then
  env JAX_PLATFORMS=cpu python experiments/gen_darcy_mat.py \
    --cache data/input_data/synthetic/darcy_g241_n1024_t128.npz \
    --out piececonst_synth_r241_N1024_smooth1 \
    >> "$OUT/gen_darcy_mat.log" 2>&1 || true
fi
run_job darcy_matfile_N64 2700 python experiments/darcy/solve_darcy_gmrf_fem.py \
  --datasetname piececonst_synth_r241_N1024_smooth1 \
  --N_xy 64 --grid 241 --N_instances 32 --sqrt --sqrt_prefactor off \
  --mean_only
