#!/usr/bin/env bash
# stage 2 with the rigid ball object
# (reference launcher: tools_fluid_nexus/object_train_dynamics_physical.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_physical_particle \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/object_physical_reconstruction" \
  --bg_load_path "$ROOT/output/ball_background" \
  --loader fluid_nexus_real --config "$CFG/object.json" "$@"
