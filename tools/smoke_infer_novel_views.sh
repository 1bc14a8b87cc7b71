#!/usr/bin/env bash
# Zero123 stage inference (ref Zero123/tools/infer_fluid_nexus_smoke.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.infer_novel_view \
  --data_dir "$ROOT/FluidNexus-Smoke/zero123_dataset" \
  --out_dir "$ROOT/FluidNexus-Smoke" --ckpt "$ROOT/ckpts/zero123_smoke" "$@"
