#!/usr/bin/env bash
# stage 1: background Gaussians (ref tools_fluid_nexus/smoke_train_background.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.train_background \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_background" \
  --capture_part smoke --is_bg --init_pcd_bg \
  --config configs/fluid_nexus_smoke_background.json "$@"
