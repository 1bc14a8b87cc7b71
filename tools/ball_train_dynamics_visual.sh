#!/usr/bin/env bash
# stage 3: level-two appearance fit (ball)
# (reference launcher: tools_fluid_nexus/ball_train_dynamics_visual.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/ball_visual_level_two" \
  --bg_load_path "$ROOT/output/ball_background" --load_path "$ROOT/output/ball_physical_reconstruction" \
  --loader fluid_nexus_real --config "$CFG/ball_dynamics.json" "$@"
