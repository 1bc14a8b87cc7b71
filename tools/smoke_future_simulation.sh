#!/usr/bin/env bash
# stage 4: future rollout (smoke)
# (reference launcher: tools_fluid_nexus/smoke_future_simulation.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.future_simulation \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_future_simulation" \
  --bg_load_path "$ROOT/output/smoke_background" --load_path "$ROOT/output/smoke_physical_reconstruction" --level_two_load_path "$ROOT/output/smoke_visual_level_two" \
  --loader fluid_nexus_real --config "$CFG/smoke_future_simulation.json" "$@"
