#!/usr/bin/env bash
# TPU CI lane: run every compiled-Mosaic numerics claim on the REAL chip.
#
# The CPU suite (tests/conftest.py) forces an 8-virtual-device CPU mesh, so
# all Pallas kernels there run in INTERPRETER mode; this lane executes the
# compiled kernels:
#   1. compiled-vs-interpret rasterizer fwd+bwd equivalence (tools/tpu_raster_check.py)
#   2. the standalone real-scale smokes (5B fwd, 5B LoRA train w/ int8 base,
#      real-shape VAE decode, flash attention, remat HBM budget)
#
# Output is recorded to TPU_TESTS.txt at the repo root (committed each round,
# VERDICT r2 item 7). Exit code 0 = all lanes passed.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"   # reuse relay compiles
OUT=TPU_TESTS.txt
: > "$OUT"
fail=0

run_lane() {
  local name="$1"; shift
  echo "=== $name ===" | tee -a "$OUT"
  if timeout "${LANE_TIMEOUT:-1800}" "$@" >> "$OUT" 2>&1; then
    echo "--- $name: PASS" | tee -a "$OUT"
  else
    echo "--- $name: FAIL (rc=$?)" | tee -a "$OUT"
    fail=1
  fi
}

echo "TPU test lane $(date -u +%FT%TZ)" | tee -a "$OUT"
python - <<'EOF' | tee -a "$OUT"
import jax
print("backend:", jax.default_backend(), jax.devices())
EOF

run_lane "raster compiled-vs-interpret" python tools/tpu_raster_check.py
run_lane "PBF dense pallas (compiled)"  python tools/tpu_pbf_check.py
run_lane "flash attention (real shape)" python tests/test_flash_attention.py
run_lane "remat HBM budget"             python tests/test_remat.py
run_lane "5B forward smoke"             python tests/test_5b_shape_smoke.py
run_lane "5B int8 LoRA train smoke"     python tests/test_5b_lora_train_smoke.py
run_lane "VAE real-shape decode smoke"  python tests/test_vae_real_shape_smoke.py

echo "RESULT: $([ $fail -eq 0 ] && echo ALL PASS || echo FAILURES)" | tee -a "$OUT"
exit $fail
