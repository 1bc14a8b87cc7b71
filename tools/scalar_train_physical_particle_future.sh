#!/usr/bin/env bash
# ScalarFlow capture: physical reconstruction future
# (reference launcher: tools_scalar_real/train_physical_particle_future.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
CFG=$(dirname "$0")/../configs
python -m fluidnexus_tpu.pipelines.train_physical_particle \
  --data_path "$ROOT/ScalarReal" --model_path "$ROOT/output/scalar_physical_reconstruction_future" \
  --loader scalar_real --config "$CFG/scalar_dynamics_future.json" "$@"
