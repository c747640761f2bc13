#!/bin/bash
# Full CI: the fast default selection AND the slow e2e/mesh set.
#
# pytest.ini deselects `slow` by default to keep the edit-test loop snappy;
# a green fast run alone does NOT exercise the e2e CLI, mesh-parity,
# checkpoint-on-mesh, convergence, or multi-process distributed tests
# (ADVICE r2). Ship only when BOTH jobs are green.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export XLA_FLAGS=--xla_force_host_platform_device_count=8
python -m pytest tests/ -q             # fast default (-m "not slow")
python -m pytest tests/ -q -m slow     # the heavy e2e/mesh/convergence set
