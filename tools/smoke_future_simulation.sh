#!/usr/bin/env bash
# stage 4: future rollout (ref tools_fluid_nexus/smoke_future_simulation.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.future_simulation \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_future" \
  --load_path "$ROOT/output/smoke_dynamics" --bg_load_path "$ROOT/output/smoke_background" \
  --config /root/reference/FluidDynamics/configs/fluid_nexus_smoke_dynamics_future_simulation.json "$@"
