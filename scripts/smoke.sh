#!/usr/bin/env bash
# Full validation sweep: everything the round driver checks, one command.
#   scripts/smoke.sh          # CPU-only (hermetic)
#   scripts/smoke.sh --tpu    # also run the headline bench on the real chip
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native library =="
make -C cpp

echo "== test suite (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== graft entry + multichip dryrun =="
SEMTOOLS_TPU_PLATFORM=cpu JAX_PLATFORMS=cpu \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "
import jax
from __graft_entry__ import entry, dryrun_multichip
fn, args = entry(); jax.jit(fn)(*args); print('entry ok')
dryrun_multichip(8)"

echo "== CLI drive =="
export SEMTOOLS_TPU_PLATFORM=cpu
SMOKE_HOME=$(mktemp -d)
export HOME="$SMOKE_HOME"
printf 'smoke alpha line\nsmoke beta line\n' > "$SMOKE_HOME/s.txt"
python -m semtools_tpu.cli --version
python -m semtools_tpu.cli search "beta" "$SMOKE_HOME/s.txt" --top-k 1 </dev/null
printf 'x\ny\n' | python -m semtools_tpu.cli search "y" -n 0
python -m semtools_tpu.cli parse "$SMOKE_HOME/s.txt" </dev/null
python -m semtools_tpu.cli workspace use smoke </dev/null
SEMTOOLS_WORKSPACE=smoke python -m semtools_tpu.cli search "alpha" "$SMOKE_HOME/s.txt" </dev/null
SEMTOOLS_WORKSPACE=smoke python -m semtools_tpu.cli workspace status -j </dev/null
SEMTOOLS_WORKSPACE=smoke python -m semtools_tpu.cli workspace prune </dev/null

echo "== quantitative bench smoke (CPU, small) =="
python benchmarks/quantitative/run_bench.py --small \
  --configs search_e2e,batched_scan,workspace_warm,workspace_batched

if [[ "${1:-}" == "--tpu" ]]; then
  echo "== headline bench (real chip) =="
  unset SEMTOOLS_TPU_PLATFORM
  python bench.py
fi

echo "SMOKE OK"
