#!/usr/bin/env bash
# stage 2: physical particle reconstruction (ref tools_fluid_nexus/smoke_train_dynamics_physical.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.train_physical_particle \
  --data_path "$ROOT/FluidNexus-Smoke" --model_path "$ROOT/output/smoke_dynamics" \
  --bg_load_path "$ROOT/output/smoke_background" \
  --config /root/reference/FluidDynamics/configs/fluid_nexus_smoke_dynamics.json "$@"
