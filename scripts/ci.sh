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

# Packaging: the wheel must build offline and carry the native source as
# package data (pyproject.toml; see test_packaged_native_source_in_sync).
wheeldir=$(mktemp -d)
python -m pip wheel --no-deps --no-build-isolation -w "$wheeldir" . -q
python - "$wheeldir" <<'EOF'
import glob, sys, zipfile
whl = glob.glob(sys.argv[1] + "/*.whl")[0]
names = zipfile.ZipFile(whl).namelist()
assert "mvropose_tpu/native/mvropose_native.cpp" in names, names
print("wheel ok:", whl.rsplit("/", 1)[1], len(names), "files")
EOF
