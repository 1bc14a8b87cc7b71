#!/usr/bin/env bash
# CogVideoX-stage long-video refinement (ref tools_gen/gen_refine_pi2v_long_fluid_nexus_smoke.sh)
set -e
ROOT=${FLUIDNEXUS_ROOT:-/data/FluidNexusRoot}
python -m fluidnexus_tpu.pipelines.gen_refine_video \
  --input_folder "$ROOT/FluidNexus-Smoke/zero123_finetune_52000_cam2to0_for_cogvideox" \
  --gt_prefix_folder "$ROOT/FluidNexus-Smoke/camera00" \
  --out_folder "$ROOT/cogvideox_outputs/smoke_cam0" \
  --dit_ckpt "$ROOT/ckpts/cogvideox_lora" --strength 0.5 "$@"
