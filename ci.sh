#!/bin/bash
# Repo CI gate (parity with /root/reference/.github/workflows/CI.yml,
# which runs build+test on every push). Two modes:
#   ./ci.sh smoke   — fast subset (~5 min): API surface, kernel/factor
#                     contracts, FEM core, one end-to-end slice, plus
#                     dryrun_multichip(8) on a virtual CPU mesh
#   ./ci.sh full    — the whole suite (~45 min) + dryrun
# Always CPU-backend (8 virtual devices) — never touches the TPU relay,
# so it is safe to run while a measurement queue holds the chip.
set -e
cd "$(dirname "$0")"
MODE=${1:-smoke}

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

if [ -f native/Makefile ] && [ ! -f native/libstructure.so ]; then
  make -C native
fi

SMOKE_FILES="tests/test_api_surface.py tests/test_btd.py \
tests/test_fem_core.py tests/test_factor_contract.py \
tests/test_srif.py tests/test_native.py"

case "$MODE" in
  smoke) python -m pytest $SMOKE_FILES -q -x ;;
  full)  python -m pytest tests/ -q ;;
  *) echo "usage: ci.sh [smoke|full]"; exit 2 ;;
esac

python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8): OK")
EOF
echo "CI $MODE: PASS"
