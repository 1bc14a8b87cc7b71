"""Generative refinement of simulated FUTURE/WIND rollouts.

Parity target: CogVideoX/gen_future_pi2v.py — identical machinery to
gen_refine_pi2v_long but the body frames come from the physics simulation's
renders (future_simulation.py outputs, filename convention
``render_frame{idx:03d}_{cam}_0000.png``) and the prefix is the tail of the
reconstruction ("i2v3" dataset-prefixed i2v). Output folder names follow
fluid_nexus_real_reader.py:340-352 so the reconstruction stage picks the
refined frames up directly.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.data.readers import future_view_folder
from fluidnexus_tpu.diffusion.video.conditioner import make_text_encoder
from fluidnexus_tpu.diffusion.video.engine import VideoEngine
from fluidnexus_tpu.pipelines.gen_refine_video import (
    RefineConfig, latent_prefix_len, load_frames, refine_long_video, save_frames,
)


def refine_future(
    engine, params, vae_params, text_emb, uc_text_emb,
    sim_render_folder: str, recon_frames_folder: str, out_root: str,
    camera_name: str, capture_part: str, gen_future_since: int,
    strength: float, cfg: RefineConfig, rng, is_wind: bool = False, log=print,
):
    """One camera's future refinement; writes into the reader-conventional
    folder under out_root."""
    strength_str = str(strength).replace(".", "d")  # 0.75 -> "0d75" (reader convention)
    folder = future_view_folder(capture_part, camera_name[-1], strength_str,
                                gen_future_since, is_wind)
    out_folder = os.path.join(out_root, folder)

    win, pre, step = cfg.window_frames, cfg.prefix_frames, cfg.frame_step
    prefix = load_frames(recon_frames_folder,
                         [gen_future_since - pre + i for i in range(pre)],
                         "%03d.png", cfg.height, cfg.width)
    # simulation renders are read every frame_step-th frame
    # (gen_future_pi2v.py:103-114 with sdedit_frame_step)
    body = load_frames(sim_render_folder,
                       [gen_future_since + step * i for i in range(win - pre)],
                       f"render_frame%03d_{camera_name}_0000.png", cfg.height, cfg.width)
    frames = np.concatenate([prefix, body], 0)

    rng, k_enc, k_s = jax.random.split(rng, 3)
    z = engine.encode_first_stage(vae_params, jnp.asarray(frames)[None], k_enc)
    n_pre = latent_prefix_len(pre)
    z_tchw = jnp.transpose(z, (0, 1, 4, 2, 3))
    out_lat = engine.sample(
        params, z_tchw.shape, text_emb, uc_text_emb, rng=k_s, num_steps=cfg.num_steps,
        frames_z=z_tchw, sdedit_strength=strength,
        prefix_clean_frames=z_tchw[:, :n_pre], cfg_scale=cfg.cfg_scale,
    )
    decoded = engine.decode_first_stage(
        vae_params, jnp.transpose(out_lat, (0, 1, 3, 4, 2)), chunk=cfg.decode_chunk,
        spatial_tiles=getattr(cfg, 'decode_tiles', 1),
        first_latents=getattr(cfg, 'decode_first_latents', 0) or None)
    out_frames = np.asarray(decoded[0])[pre:]
    save_frames(out_folder, out_frames, start_index=gen_future_since)
    log(f"{camera_name}: wrote {len(out_frames)} refined future frames to {out_folder}")
    return out_folder


def main(argv=None):
    ap = argparse.ArgumentParser(description="refine simulated future/wind rollouts")
    ap.add_argument("--preset", default="",
                    help="shipped configs_gen pin set (configs/gen_*.json): "
                         "future_smoke | future_ball | future_scalar | "
                         "wind_smoke, or a JSON path; explicit flags override")
    ap.add_argument("--sim_render_folder", required=True)
    ap.add_argument("--recon_frames_folder", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--camera_name", default="train00")
    ap.add_argument("--capture_part", default="smoke")
    ap.add_argument("--gen_future_since", type=int, default=90)
    ap.add_argument("--strength", type=float, default=0.75)
    ap.add_argument("--is_wind", action="store_true")
    ap.add_argument("--prompt", default="a smoke plume")
    ap.add_argument("--dit_ckpt", default="")
    ap.add_argument("--vae_ckpt", default="")
    ap.add_argument("--t5_dir", default="")
    ap.add_argument("--window_frames", type=int, default=49)
    ap.add_argument("--prefix_frames", type=int, default=9)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel shards for the DiT forward")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--allow_fake_conditioning", action="store_true",
                    help="run without real T5 weights using hash "
                         "pseudo-embeddings (test/smoke only; implied "
                         "by --tiny)")
    ap.add_argument("--pack_video", action="store_true",
                    help="also pack the refined frames into a video file")
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--frame_step", type=int, default=1,
                    help="read every Nth simulation render (sdedit_frame_step)")
    pre_args, _ = ap.parse_known_args(argv)
    if pre_args.preset:
        from fluidnexus_tpu.core.gen_presets import (
            apply_preset_defaults, load_gen_preset)

        apply_preset_defaults(ap, load_gen_preset(pre_args.preset))
    args = ap.parse_args(argv)

    from fluidnexus_tpu.core.checkpoint import load_params, load_params_prefer_ema
    from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig

    lat_t = (args.window_frames - 1) // 4 + 1
    if args.tiny:
        dit_cfg = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                                 text_hidden_size=64, text_length=8, latent_frames=lat_t,
                                 latent_height=args.height // 8, latent_width=args.width // 8,
                                 dtype=jnp.float32)
        vae_cfg = VAE3DConfig(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
        txt_hidden = 64
    else:
        dit_cfg = VideoDiTConfig(latent_frames=lat_t, latent_height=args.height // 8,
                                 latent_width=args.width // 8)
        vae_cfg = VAE3DConfig()
        txt_hidden = dit_cfg.text_hidden_size

    engine = VideoEngine(dit_cfg, vae_cfg)
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

    cfg = RefineConfig(window_frames=args.window_frames, prefix_frames=args.prefix_frames,
                       num_steps=args.num_steps, height=args.height, width=args.width,
                       frame_step=args.frame_step)
    out = refine_future(engine, params, vae_params, text_emb, jnp.zeros_like(text_emb),
                        args.sim_render_folder, args.recon_frames_folder, args.out_root,
                        args.camera_name, args.capture_part, args.gen_future_since,
                        args.strength, cfg, jax.random.PRNGKey(2), args.is_wind)
    if args.pack_video:
        from fluidnexus_tpu.utils.video_io import frames_folder_to_video

        print("video:", frames_folder_to_video(out, fps=args.fps))


if __name__ == "__main__":
    main()
