#!/usr/bin/env bash
# stage 1: background splats (smoke)
# (reference launcher: tools_fluid_nexus/smoke_train_background.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_background \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_background" \
  --loader fluid_nexus_real --config "$CFG/smoke_background.json" "$@"
