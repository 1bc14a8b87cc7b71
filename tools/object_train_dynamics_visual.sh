#!/usr/bin/env bash
# stage 3 with the rigid ball object
# (reference launcher: tools_fluid_nexus/object_train_dynamics_visual.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/object_visual_level_two" \
  --bg_load_path "$ROOT/output/ball_background" --load_path "$ROOT/output/object_physical_reconstruction" \
  --loader fluid_nexus_real --config "$CFG/object.json" "$@"
