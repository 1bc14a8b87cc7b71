#!/usr/bin/env bash
# ScalarFlow capture: level-two fit future
# (reference launcher: tools_scalar_real/train_visual_particle_future.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/ScalarReal" --model_path "$ROOT/output/scalar_visual_level_two_future" \
  --load_path "$ROOT/output/scalar_physical_reconstruction_future" \
  --loader scalar_real --config "$CFG/scalar_dynamics_future.json" "$@"
