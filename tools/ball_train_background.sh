#!/usr/bin/env bash
# stage 1: background splats (ball)
# (reference launcher: tools_fluid_nexus/ball_train_background.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_background \
  --data_path "$ROOT/FluidNexus-Ball" --model_path "$ROOT/output/ball_background" \
  --loader fluid_nexus_real --config "$CFG/ball_background.json" "$@"
