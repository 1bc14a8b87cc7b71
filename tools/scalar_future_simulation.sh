#!/usr/bin/env bash
# ScalarFlow capture: future rollout
# (reference launcher: tools_scalar_real/future_simulation.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.future_simulation \
  --data_path "$ROOT/ScalarReal" --model_path "$ROOT/output/scalar_future_simulation" \
  --load_path "$ROOT/output/scalar_physical_reconstruction" --level_two_load_path "$ROOT/output/scalar_visual_level_two" \
  --loader scalar_real --config "$CFG/scalar_future_simulation.json" "$@"
