#!/usr/bin/env bash
# stage 4: future rollout (ball)
# (reference launcher: tools_fluid_nexus/ball_future_simulation.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.future_simulation \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/ball_future_simulation" \
  --bg_load_path "$ROOT/output/ball_background" --load_path "$ROOT/output/ball_physical_reconstruction" --level_two_load_path "$ROOT/output/ball_visual_level_two" \
  --loader fluid_nexus_real --config "$CFG/ball_future_simulation.json" "$@"
