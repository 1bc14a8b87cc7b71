#!/usr/bin/env bash
# ScalarFlow capture: level-two fit
# (reference launcher: tools_scalar_real/train_visual_particle.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/ScalarReal" --model_path "$ROOT/output/scalar_visual_level_two" \
  --load_path "$ROOT/output/scalar_physical_reconstruction" \
  --loader scalar_real --config "$CFG/scalar_dynamics.json" "$@"
