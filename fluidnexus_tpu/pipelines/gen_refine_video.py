"""Long-video generative refinement: chained SDEdit windows over the video
diffusion model (the CogVideoX stage).

Parity target: CogVideoX/gen_refine_pi2v_long.py (sampling_main:29-281):
  - 3 chained windows of 49 frames; window k's first ``prefix_frames`` frames
    are the LAST frames of window k-1's output (GT capture frames for window
    1) (:100-130);
  - remaining frames come from the Zero123 per-frame outputs, SDEdit-noised
    at the configured strength (:224);
  - the prefix frames' CLEAN latents are re-pasted at every sampler step
    (prefix clamping, sampling.py:716-717);
  - chunked VAE decode with the conv cache (:253-265).

The reference ping-pongs the 5B model and VAE between CPU and GPU (:203-239);
on TPU both stay resident (shard with the 'model' axis when memory-bound).
gen_future_pi2v (future/wind refinement) is this module with inputs taken
from simulation renders — see gen_future_video.py.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.diffusion.video.conditioner import make_text_encoder
from fluidnexus_tpu.diffusion.video.engine import VideoEngine


@dataclasses.dataclass
class RefineConfig:
    window_frames: int = 49          # 4k+1 for the causal VAE
    prefix_frames: int = 9           # "prefix9"
    num_windows: int = 3
    sdedit_strength: float = 0.5
    num_steps: int = 50
    cfg_scale: float = 6.0
    height: int = 480
    width: int = 720
    # configs_gen parity: source frames are read every `frame_step`-th capture
    # frame, window w's body starts at window_start_indices[w] in the input
    # folder (default: contiguous chaining), and window 1's GT prefix starts
    # at gt_prefix_start (sdedit_prefix_start_idx_one)
    frame_step: int = 1
    window_start_indices: Optional[Sequence[int]] = None
    gt_prefix_start: int = 0
    decode_chunk: int = 2
    # >1: width-tiled decode (the single-16GiB-chip recipe for 480x720;
    # pair with decode_first_latents=1 — vae3d.spatial_tiled_decode)
    decode_tiles: int = 1
    decode_first_latents: int = 0   # 0 = reference [chunk+rem, ...] split


def load_frames(folder: str, indices: Sequence[int], pattern: str, height: int, width: int):
    """Load frames as (T,H,W,3) in [-1,1] (data_video.py: (x-127.5)/127.5)."""
    from PIL import Image

    out = []
    for i in indices:
        path = os.path.join(folder, pattern % i)
        img = Image.open(path).convert("RGB").resize((width, height), Image.LANCZOS)
        out.append(np.asarray(img, np.float32))
    return (np.stack(out) - 127.5) / 127.5


def save_frames(folder: str, frames: np.ndarray, start_index: int, pattern="frame_%06d.png"):
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    for i, f in enumerate(frames):
        arr = np.clip((f + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, pattern % (start_index + i)))


def latent_prefix_len(prefix_frames: int) -> int:
    """frames -> causal-VAE latent frames: (n-1)/4 + 1."""
    return (prefix_frames - 1) // 4 + 1


def refine_long_video(
    engine: VideoEngine,
    params,
    vae_params,
    text_emb,
    uc_text_emb,
    input_folder: str,
    gt_prefix_folder: str,
    out_folder: str,
    cfg: RefineConfig,
    rng,
    input_pattern: str = "frame_%06d.png",
    gt_pattern: str = "%03d.png",
    log=print,
):
    """Refine input frames (Zero123 outputs) into a temporally coherent long
    video. Returns the list of written frame counts per window."""
    win, pre = cfg.window_frames, cfg.prefix_frames
    written = []
    prev_output: Optional[np.ndarray] = None
    start = 0
    for w in range(cfg.num_windows):
        step = cfg.frame_step
        if w == 0:
            # gen_refine_pi2v_long.py:101-103: GT prefix read at frame_step
            gt_idx = [cfg.gt_prefix_start + step * i for i in range(pre)]
            prefix = load_frames(gt_prefix_folder, gt_idx, gt_pattern, cfg.height, cfg.width)
        else:
            # :105-114: the tail of the previous window's OUTPUT (step 1);
            # prefix_start_idx_two/three == num_frames - prefix_num_frames
            prefix = prev_output[-pre:]
        if cfg.window_start_indices is not None:
            s0 = int(cfg.window_start_indices[w])
            body_idx = [s0 + step * i for i in range(win - pre)]
        else:
            body_idx = [start + pre + step * i for i in range(win - pre)]
        body = load_frames(input_folder, body_idx, input_pattern, cfg.height, cfg.width)
        frames = np.concatenate([prefix, body], 0)  # (49,H,W,3)
        assert frames.shape[0] == win

        rng, k_enc, k_s = jax.random.split(rng, 3)
        z = engine.encode_first_stage(vae_params, jnp.asarray(frames)[None], k_enc)
        n_pre_lat = latent_prefix_len(pre)
        prefix_clean = z[:, :n_pre_lat]

        # latents for the DiT are (B,T,C,H,W)
        z_tchw = jnp.transpose(z, (0, 1, 4, 2, 3))
        prefix_tchw = jnp.transpose(prefix_clean, (0, 1, 4, 2, 3))
        out_lat = engine.sample(
            params, z_tchw.shape, text_emb, uc_text_emb, rng=k_s,
            num_steps=cfg.num_steps, frames_z=z_tchw,
            sdedit_strength=cfg.sdedit_strength, prefix_clean_frames=prefix_tchw,
            cfg_scale=cfg.cfg_scale,
        )
        out_lat = jnp.transpose(out_lat, (0, 1, 3, 4, 2))  # back to channel-last
        decoded = engine.decode_first_stage(
            vae_params, out_lat, chunk=cfg.decode_chunk,
            spatial_tiles=cfg.decode_tiles,
            first_latents=cfg.decode_first_latents or None)
        out_frames = np.asarray(decoded[0])

        # window 1 writes all frames; later windows skip the re-decoded prefix
        emit = out_frames if w == 0 else out_frames[pre:]
        save_frames(out_folder, emit, start_index=start if w == 0 else start + pre)
        written.append(len(emit))
        prev_output = out_frames
        start += win - pre if w == 0 else win - pre
        log(f"window {w}: wrote {len(emit)} frames (total start now {start})")
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description="long-video generative refinement")
    ap.add_argument("--preset", default="",
                    help="shipped configs_gen pin set (configs/gen_*.json): "
                         "refine_smoke | refine_ball | refine_scalar, or a "
                         "JSON path; explicit flags override preset values")
    ap.add_argument("--input_folder", required=True, help="Zero123 frame folder")
    ap.add_argument("--gt_prefix_folder", required=True, help="real capture frames for window 1")
    ap.add_argument("--out_folder", required=True)
    ap.add_argument("--prompt", default="a smoke plume")
    ap.add_argument("--dit_ckpt", default="")
    ap.add_argument("--vae_ckpt", default="")
    ap.add_argument("--t5_dir", default="")
    ap.add_argument("--strength", type=float, default=0.5)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--num_windows", type=int, default=3)
    ap.add_argument("--window_frames", type=int, default=49)
    ap.add_argument("--prefix_frames", type=int, default=9)
    ap.add_argument("--frame_step", type=int, default=1,
                    help="read every Nth source frame (sdedit_frame_step)")
    ap.add_argument("--window_start_indices", type=int, nargs="*", default=None,
                    help="per-window body start frame in input_folder "
                         "(sdedit_start_idx_one/two/three)")
    ap.add_argument("--gt_prefix_start", type=int, default=0,
                    help="window 1's GT prefix start frame "
                         "(sdedit_prefix_start_idx_one)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel shards for the DiT (the TPU answer "
                         "to the reference's CPU<->GPU 5B offload ping-pong)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel shards (the batch-2 CFG forward)")
    ap.add_argument("--tiny", action="store_true", help="tiny random model (smoke test)")
    ap.add_argument("--allow_fake_conditioning", action="store_true",
                    help="run without real T5 weights using hash "
                         "pseudo-embeddings (test/smoke only; implied "
                         "by --tiny)")
    ap.add_argument("--pack_video", action="store_true",
                    help="also pack the refined frames into a video file")
    ap.add_argument("--fps", type=int, default=8)
    pre_args, _ = ap.parse_known_args(argv)
    if pre_args.preset:
        from fluidnexus_tpu.core.gen_presets import (
            apply_preset_defaults, load_gen_preset)

        apply_preset_defaults(ap, load_gen_preset(pre_args.preset))
    args = ap.parse_args(argv)

    from fluidnexus_tpu.diffusion.video.dit import VideoDiTConfig
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig

    lat_t = (args.window_frames - 1) // 4 + 1
    if args.tiny:
        dit_cfg = VideoDiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                                 text_hidden_size=64, text_length=8,
                                 latent_frames=lat_t, latent_height=args.height // 8,
                                 latent_width=args.width // 8, dtype=jnp.float32)
        vae_cfg = VAE3DConfig(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
        txt_hidden = 64
    else:
        dit_cfg = VideoDiTConfig(latent_frames=lat_t, latent_height=args.height // 8,
                                 latent_width=args.width // 8)
        vae_cfg = VAE3DConfig()
        txt_hidden = dit_cfg.text_hidden_size

    engine = VideoEngine(dit_cfg, vae_cfg)
    from fluidnexus_tpu.core.checkpoint import load_params, load_params_prefer_ema

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
    uc_text_emb = jnp.zeros_like(text_emb)

    cfg = RefineConfig(window_frames=args.window_frames, prefix_frames=args.prefix_frames,
                       num_windows=args.num_windows, sdedit_strength=args.strength,
                       num_steps=args.num_steps, height=args.height, width=args.width,
                       frame_step=args.frame_step,
                       window_start_indices=args.window_start_indices,
                       gt_prefix_start=args.gt_prefix_start)
    refine_long_video(engine, params, vae_params, text_emb, uc_text_emb,
                      args.input_folder, args.gt_prefix_folder, args.out_folder,
                      cfg, jax.random.PRNGKey(2))
    if args.pack_video:
        from fluidnexus_tpu.utils.video_io import frames_folder_to_video

        print("video:", frames_folder_to_video(args.out_folder, fps=args.fps))


if __name__ == "__main__":
    main()
