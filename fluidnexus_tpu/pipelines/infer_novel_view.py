"""Per-frame novel-view synthesis inference (Zero123 stage).

Parity target: Zero123/inference/infer_fluid_nexus_smoke.py (main_demo:23-87)
+ helpers/test_helpers.py (main_run_simple/sample_model_simple:18-95): for
each frame, condition on the source camera's image, compute the spherical
pose delta to each target camera (camera/{i:02d}.npy W2C matrices), run a
50-step CFG-3.0 DDIM sample, and write
``<out>/zero123_finetune_<steps>_cam{s}to{c}/frame_{i:06d}.png``.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.diffusion.ldm.model import NovelViewModel, get_pose_delta


def load_image(path, size=256):
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def save_image(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def run_inference(
    model: NovelViewModel,
    params,
    data_dir: str,
    out_dir: str,
    source_cam: int = 2,
    target_cams=(0, 1, 3, 4),
    num_frames: int = 410,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    image_size: int = 256,
    finetune_steps: int = 52000,
    seed: int = 0,
    log=print,
):
    """data_dir layout (DataProcessing/fluid_nexus_real/create_zero123_dataset):
    frame_%03d/{cam:02d}.png + camera/{cam:02d}.npy W2C matrices."""
    cams = {i: np.load(os.path.join(data_dir, "camera", f"{i:02d}.npy"))
            for i in set(list(target_cams) + [source_cam])}
    deltas = {c: jnp.asarray(get_pose_delta(cams[c], cams[source_cam])[None]) for c in target_cams}

    sample = jax.jit(
        lambda p, cond, dt, rng: model.ddim_sample(
            p, cond, dt, rng, num_steps=num_steps, cfg_scale=cfg_scale, image_size=image_size),
    )

    rng = jax.random.PRNGKey(seed)
    for i in range(num_frames):
        cond_path = os.path.join(data_dir, f"frame_{i:03d}", f"{source_cam:02d}.png")
        if not os.path.exists(cond_path):
            log(f"stopping at frame {i}: {cond_path} missing")
            break
        cond = jnp.asarray(load_image(cond_path, image_size))[None]
        for c in target_cams:
            rng, k = jax.random.split(rng)
            out = sample(params, cond, deltas[c], k)
            save_image(
                os.path.join(out_dir, f"zero123_finetune_{finetune_steps}_cam{source_cam}to{c}",
                             f"frame_{i:06d}.png"),
                np.asarray(out[0]),
            )
        if i % 20 == 0:
            log(f"frame {i}/{num_frames}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="novel-view inference")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--ckpt", default="", help="orbax/npz checkpoint of model params")
    ap.add_argument("--source_cam", type=int, default=2)
    ap.add_argument("--target_cams", type=int, nargs="+", default=[0, 1, 3, 4])
    ap.add_argument("--num_frames", type=int, default=410)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--cfg_scale", type=float, default=3.0)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--finetune_steps", type=int, default=52000)
    args = ap.parse_args(argv)

    model = NovelViewModel()
    if args.ckpt:
        # prefer the LitEma shadow when the finetune saved one (the reference
        # samples with model_ema scopes active, ddpm.py:151-162)
        from fluidnexus_tpu.core.checkpoint import load_params_prefer_ema

        params = load_params_prefer_ema(args.ckpt)
    else:
        print("WARNING: no --ckpt given; using random init (smoke-test mode)")
        params = model.init_params(jax.random.PRNGKey(0), image_size=args.image_size)
    run_inference(model, params, args.data_dir, args.out_dir, args.source_cam,
                  tuple(args.target_cams), args.num_frames, args.num_steps,
                  args.cfg_scale, args.image_size, args.finetune_steps)


if __name__ == "__main__":
    main()
