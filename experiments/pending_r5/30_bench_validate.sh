# validate bench.py on chip BEFORE the driver's end-of-round capture:
# the 413-fix (operands through jit signatures) + Pallas POTRF arm have
# not run on chip since they landed; a failure at round end would lose
# BENCH_r05 with no time to fix
run_job bench_r5_validate 2700 python bench.py
cp -f results/bench_tpu_last.json "$OUT/bench_r5_validate.json" 2>/dev/null || true
