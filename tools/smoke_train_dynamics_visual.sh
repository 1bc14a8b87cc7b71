#!/usr/bin/env bash
# stage 3: level-two appearance fit (ref tools_fluid_nexus/smoke_train_dynamics_visual.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.train_visual_particle \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_level_two" \
  --load_path "$ROOT/output/smoke_dynamics" --bg_load_path "$ROOT/output/smoke_background" \
  --config /root/reference/FluidDynamics/configs/fluid_nexus_smoke_dynamics.json "$@"
