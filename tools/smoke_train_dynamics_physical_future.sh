#!/usr/bin/env bash
# stage 2 on generated-future frames (smoke)
# (reference launcher: tools_fluid_nexus/smoke_train_dynamics_physical_future.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_physical_particle \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_physical_reconstruction_future" \
  --bg_load_path "$ROOT/output/smoke_background" \
  --loader fluid_nexus_real --config "$CFG/smoke_dynamics_future.json" "$@"
