#!/usr/bin/env bash
# stage 3 for the wind-interaction capture
# (reference launcher: tools_fluid_nexus/smoke_wind_train_dynamics_visual.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_wind_visual_level_two" \
  --bg_load_path "$ROOT/output/smoke_background" --load_path "$ROOT/output/smoke_wind_physical_reconstruction" \
  --loader fluid_nexus_real --config "$CFG/smoke_dynamics_wind.json" "$@"
