# mid-round official bench capture: validates the HTTP-413 fix on the
# secondary metrics (operands now thread through the jit signature) and
# measures the Pallas POTRF arm against the 16.2 TF/s XLA path
# (VERDICT r4 weak #4). Sourced by the queue runner (run_job in scope).
run_job bench_midround_r5 2400 python bench.py
cp -f results/bench_tpu_last.json "$OUT/bench_midround_r5.json" 2>/dev/null || true
