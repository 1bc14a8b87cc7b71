"""Port drill: run the torch->JAX weight-port maps end to end and print
forward checksums.

The port maps (diffusion/port.py) are each oracle-tested against the
reference torch modules, but a real checkpoint only flows through them when
a user runs a pipeline — and a wiring mistake there would surface as silently
wrong outputs. This CLI exercises EVERY port map against real checkpoint
files and prints per-component parameter counts and forward checksums, so a
ported stack can be validated (and compared across machines) before any
training/generation run. With --out_dir it doubles as the torch->JAX
checkpoint converter for the pipelines' --ckpt/--dit_ckpt/--vae_ckpt flags.

    python -m fluidnexus_tpu port --zero123 last.ckpt \
        --cogvideox mp_rank_00_model_states.pt --vae3d 3d-vae.pt \
        --t5 /path/t5-v1_1-xxl --out_dir ports/

Reference checkpoints being ported: Zero123 Lightning ckpt (main.py:98-128),
CogVideoX SAT ckpt + LoRA (sat load_checkpoint; gen_refine_pi2v_long.py:39),
CogVideoX 3D-VAE (vae yaml ckpt_path), HF t5-v1_1-xxl
(sgm/modules/encoders/modules.py:233).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _checksum(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))))


def _n_params(tree) -> int:
    import jax

    return sum(int(np.prod(np.asarray(l).shape)) for l in jax.tree.leaves(tree))


def _report(name, tree, fwd=None):
    line = f"[port] {name:14s} {_n_params(tree) / 1e6:10.2f}M params"
    if fwd is not None:
        line += f"   forward checksum {fwd:.6g}"
    print(line)


def _save(out_dir, name, tree):
    if out_dir:
        from fluidnexus_tpu.core.checkpoint import save_params

        path = os.path.join(out_dir, name)
        save_params(path, tree)
        print(f"[port] {name:14s} saved -> {path}")


def drill_zero123(path, out_dir="", unet_cfg=None, vae_cfg=None,
                  clip_cfg=None, image_size=64):
    """Zero123/FluidNexus Lightning ckpt -> NovelViewModel tree (+ forward)."""
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.diffusion.ldm.autoencoder import KLVAEConfig
    from fluidnexus_tpu.diffusion.ldm.clip import CLIPVisionConfig
    from fluidnexus_tpu.diffusion.ldm.model import NovelViewModel
    from fluidnexus_tpu.diffusion.ldm.unet import UNetConfig
    from fluidnexus_tpu.diffusion.port import (load_torch_state_dict,
                                               port_zero123_checkpoint)

    sd = load_torch_state_dict(path)
    model = NovelViewModel(
        unet_config=unet_cfg or UNetConfig(),
        vae_config=vae_cfg or KLVAEConfig(),
        clip_config=clip_cfg or CLIPVisionConfig(),
    )
    params = port_zero123_checkpoint(sd, model.unet_config, model.vae_config,
                                     clip_layers=model.clip_config.layers)
    ctx, concat = model.conditioning(
        params, jnp.zeros((1, model.clip_config.image_size,
                           model.clip_config.image_size, 3)),
        jnp.zeros((1, 4)))
    lat = image_size // model.downsample_factor
    eps = model.unet.apply(
        {"params": params["unet"]},
        jnp.zeros((1, lat, lat, model.unet_config.in_channels)),
        jnp.zeros((1,), jnp.int32), ctx)
    _report("zero123.unet", params["unet"], _checksum(eps))
    _report("zero123.vae", params["vae"], _checksum(concat))
    _report("zero123.clip", params["clip"], _checksum(ctx))
    _report("zero123.cc", params["cc"])
    _save(out_dir, "zero123", params)
    return params


def drill_cogvideox(path, out_dir="", dit_cfg=None, quant=False):
    """SAT DiT ckpt (base or LoRA finetune) -> VideoDiT tree (+ forward)."""
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.diffusion.port import (graft_params_into,
                                               load_torch_state_dict,
                                               port_video_dit)
    from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig

    cfg = dit_cfg or VideoDiTConfig(latent_frames=2, latent_height=8,
                                    latent_width=8)
    sd = load_torch_state_dict(path)
    ported = port_video_dit(sd, cfg)
    dit = VideoDiT(cfg)
    template = jax.eval_shape(
        lambda: dit.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                                    cfg.latent_height, cfg.latent_width)),
                         jnp.zeros((1,), jnp.int32),
                         jnp.zeros((1, cfg.text_length,
                                    cfg.text_hidden_size)))["params"])
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params = graft_params_into(template, ported)
    out = dit.apply(
        {"params": params},
        jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                   cfg.latent_height, cfg.latent_width)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.text_length, cfg.text_hidden_size)))
    _report("video.dit", params, _checksum(out))
    if quant:
        from fluidnexus_tpu.diffusion.video.dit import quantize_dit_params

        params = quantize_dit_params(params)
        print("[port] video.dit     quantized (int8 base)")
    _save(out_dir, "video_dit", params)
    return params


def drill_vae3d(path, out_dir="", vae_cfg=None):
    """CogVideoX 3D-VAE ckpt -> VideoVAE tree (+ tiny encode checksum)."""
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.diffusion.port import (load_torch_state_dict,
                                               port_video_vae)
    from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig, VideoVAE

    cfg = vae_cfg or VAE3DConfig()
    sd = load_torch_state_dict(path)
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
    params = port_video_vae(sd, cfg)
    vae = VideoVAE(cfg)
    factor = 2 ** (len(cfg.ch_mult) - 1)
    z, _ = vae.apply({"params": params},
                     jnp.zeros((1, 5, factor * 8, factor * 8, 3)), None,
                     method=vae.encode, mutable=["cache"])
    _report("video.vae3d", params, _checksum(z))
    _save(out_dir, "video_vae", params)
    return params


def drill_t5(t5_dir, max_length=226):
    """Real-weights T5 path (modules.py:233) — must NOT hash-fallback here."""
    from fluidnexus_tpu.diffusion.video.conditioner import T5TextEncoder

    enc = T5TextEncoder(t5_dir, max_length=max_length)
    emb = enc(["a smoke plume rising"])
    print(f"[port] t5             embeds {tuple(emb.shape)}"
          f"   forward checksum {_checksum(emb):.6g}")
    return emb


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="run every torch->JAX port map over real checkpoints and "
                    "print forward checksums (optionally saving the ported "
                    "trees for the pipeline --ckpt flags)")
    ap.add_argument("--zero123", default="", help="Zero123 Lightning .ckpt")
    ap.add_argument("--cogvideox", default="",
                    help="SAT DiT ckpt (mp_rank_00_model_states.pt; raw LoRA "
                         "finetunes are merged automatically)")
    ap.add_argument("--vae3d", default="", help="CogVideoX 3D-VAE ckpt")
    ap.add_argument("--t5", default="", help="HF t5-v1_1-xxl directory")
    ap.add_argument("--out_dir", default="",
                    help="save ported trees here (zero123/, video_dit/, "
                         "video_vae/)")
    ap.add_argument("--quant_base", action="store_true",
                    help="also int8-quantize the DiT base for the "
                         "single-chip LoRA recipe")
    args = ap.parse_args(argv)
    if not (args.zero123 or args.cogvideox or args.vae3d or args.t5):
        ap.error("nothing to do: pass at least one checkpoint flag")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    if args.zero123:
        drill_zero123(args.zero123, args.out_dir)
    if args.cogvideox:
        drill_cogvideox(args.cogvideox, args.out_dir, quant=args.quant_base)
    if args.vae3d:
        drill_vae3d(args.vae3d, args.out_dir)
    if args.t5:
        drill_t5(args.t5)
    print("[port] all requested port maps ran OK")


if __name__ == "__main__":
    main()
