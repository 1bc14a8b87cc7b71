"""Generic video sampling CLI (t2v / i2v).

Parity target: CogVideoX/sample_video.py — sample clips from a text prompt,
optionally conditioned on prefix frames (i2v), without the long-video
chaining machinery of gen_refine_video.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.core.checkpoint import load_params, load_params_prefer_ema
from fluidnexus_tpu.diffusion.video.conditioner import make_text_encoder
from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
from fluidnexus_tpu.diffusion.video.engine import VideoEngine
from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig
from fluidnexus_tpu.pipelines.gen_refine_video import latent_prefix_len, load_frames, save_frames


def main(argv=None):
    ap = argparse.ArgumentParser(description="sample a video clip (t2v/i2v)")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--out_folder", required=True)
    ap.add_argument("--prefix_folder", default="", help="i2v prefix frames (optional)")
    ap.add_argument("--prefix_frames", type=int, default=0)
    ap.add_argument("--prefix_pattern", default="%03d.png")
    ap.add_argument("--num_frames", type=int, default=49)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--cfg_scale", type=float, default=6.0)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--dit_ckpt", default="")
    ap.add_argument("--vae_ckpt", default="")
    ap.add_argument("--t5_dir", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel shards for the DiT forward (the TPU "
                         "replacement for the reference's CPU<->GPU offload)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel shards (the batch-2 CFG forward)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--allow_fake_conditioning", action="store_true",
                    help="run without real T5 weights using hash "
                         "pseudo-embeddings (test/smoke only; implied "
                         "by --tiny)")
    ap.add_argument("--pack_video", action="store_true",
                    help="also pack frames into a video file (mp4 or MJPEG avi)")
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--base", nargs="+", default=[],
                    help="reference CogVideoX YAML config(s) (merged in order; "
                         "sampler/model geometry defaults come from them)")
    pre, _ = ap.parse_known_args(argv)
    run_cfg = None
    if pre.base:
        from fluidnexus_tpu.diffusion.video.config_yaml import load_cogvideox_yaml

        run_cfg = load_cogvideox_yaml(pre.base)
        ap.set_defaults(num_frames=run_cfg.train.max_num_frames,
                        num_steps=run_cfg.sampler.num_steps,
                        cfg_scale=run_cfg.sampler.scale,
                        height=run_cfg.train.video_size[0],
                        width=run_cfg.train.video_size[1],
                        t5_dir=run_cfg.t5_dir)
    args = ap.parse_args(argv)

    lat_t = (args.num_frames - 1) // 4 + 1
    if args.tiny:
        dit_cfg = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                                 text_hidden_size=64, text_length=8, latent_frames=lat_t,
                                 latent_height=args.height // 8, latent_width=args.width // 8,
                                 dtype=jnp.float32)
        vae_cfg = VAE3DConfig(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
        txt_hidden = 64
    elif run_cfg is not None:
        import dataclasses

        dit_cfg = dataclasses.replace(run_cfg.dit, latent_frames=lat_t,
                                      latent_height=args.height // 8,
                                      latent_width=args.width // 8)
        vae_cfg = run_cfg.vae
        txt_hidden = dit_cfg.text_hidden_size
    else:
        dit_cfg = VideoDiTConfig(latent_frames=lat_t, latent_height=args.height // 8,
                                 latent_width=args.width // 8)
        vae_cfg = VAE3DConfig()
        txt_hidden = dit_cfg.text_hidden_size

    engine = VideoEngine(dit_cfg, vae_cfg, cfg_scale=args.cfg_scale)
    params = load_params_prefer_ema(args.dit_ckpt) if args.dit_ckpt else engine.init_params(jax.random.PRNGKey(0))
    vae_params = load_params(args.vae_ckpt) if args.vae_ckpt else engine.init_vae_params(
        jax.random.PRNGKey(1), frames=5, height=args.height, width=args.width)
    if args.tp * args.dp > 1:
        from fluidnexus_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.dp * args.tp, dp=args.dp, tp=args.tp)
        params, vae_params = engine.shard_for_generation(params, vae_params, mesh)
    enc = make_text_encoder(args.t5_dir or None, max_length=dit_cfg.text_length,
                            hidden=txt_hidden,
                            allow_fake=args.allow_fake_conditioning or args.tiny)
    text_emb = enc([args.prompt])
    uc = jnp.zeros_like(text_emb)

    rng = jax.random.PRNGKey(args.seed)
    prefix_lat = None
    if args.prefix_folder and args.prefix_frames > 0:
        frames = load_frames(args.prefix_folder, range(args.prefix_frames),
                             args.prefix_pattern, args.height, args.width)
        rng, k = jax.random.split(rng)
        z = engine.encode_first_stage(vae_params, jnp.asarray(frames)[None], k)
        prefix_lat = jnp.transpose(z, (0, 1, 4, 2, 3))[:, :latent_prefix_len(args.prefix_frames)]

    shape = (1, lat_t, dit_cfg.in_channels, dit_cfg.latent_height, dit_cfg.latent_width)
    rng, k = jax.random.split(rng)
    lat = engine.sample(params, shape, text_emb, uc, rng=k, num_steps=args.num_steps,
                        prefix_clean_frames=prefix_lat)
    decoded = engine.decode_first_stage(vae_params, jnp.transpose(lat, (0, 1, 3, 4, 2)))
    save_frames(args.out_folder, np.asarray(decoded[0]), 0)
    if args.pack_video:
        from fluidnexus_tpu.utils.video_io import frames_folder_to_video

        print("video:", frames_folder_to_video(args.out_folder, fps=args.fps))
    print(f"wrote {decoded.shape[1]} frames to {args.out_folder}")


if __name__ == "__main__":
    main()
