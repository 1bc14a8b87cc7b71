#!/usr/bin/env bash
# stage 3 on generated-future recon (ball)
# (reference launcher: tools_fluid_nexus/ball_train_dynamics_visual_future.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/ball_visual_level_two_future" \
  --bg_load_path "$ROOT/output/ball_background" --load_path "$ROOT/output/ball_physical_reconstruction_future" \
  --loader fluid_nexus_real --config "$CFG/ball_dynamics_future.json" "$@"
