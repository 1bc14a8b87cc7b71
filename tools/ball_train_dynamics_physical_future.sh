#!/usr/bin/env bash
# stage 2 on generated-future frames (ball)
# (reference launcher: tools_fluid_nexus/ball_train_dynamics_physical_future.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_physical_particle \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/ball_physical_reconstruction_future" \
  --bg_load_path "$ROOT/output/ball_background" \
  --loader fluid_nexus_real --config "$CFG/ball_dynamics_future.json" "$@"
