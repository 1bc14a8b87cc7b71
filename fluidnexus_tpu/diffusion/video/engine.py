"""Video diffusion engine: DiT + causal VAE + denoiser + sampler + loss.

Parity target: CogVideoX/diffusion_video.py (SATVideoDiffusionEngine:32-396)
and sgm/modules/diffusionmodules/loss.py (VideoDiffusionLoss:75-134):
  - training loss: sample a discrete timestep, noise the latents, keep the
    first ``fixed_frames`` latents CLEAN for prefix-i2v (loss.py:111-112),
    denoise, weighted-L2 against x0 with w = 1/(1-abar) (v-pred weighting,
    loss.py:120-127);
  - LoRA-only finetuning: every non-LoRA param frozen
    (diffusion_video.py:105-127);
  - sample(): DPM++(2M) SDE with SDEdit strength + clean-prefix clamping
    (diffusion_video.py:242-289).

The reference's model-parallel noise/idx/sigma broadcasts (loss.py:94-100)
disappear on TPU: the same program computes the same RNG stream on every
device (SPMD), so consistency is structural.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.diffusion.schedules import append_dims
from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig
from fluidnexus_tpu.diffusion.video.sampling import (
    DynamicCFG, VDenoiser, sample_dpmpp2m_sde, zero_snr_alphas_sqrt,
)
from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig, VideoVAE, chunked_decode


@dataclasses.dataclass
class VideoEngine:
    dit_config: VideoDiTConfig
    vae_config: VAE3DConfig = dataclasses.field(default_factory=VAE3DConfig)
    num_timesteps: int = 1000
    fixed_frames: int = 0          # prefix-i2v clean frames (yaml :131)
    cfg_scale: float = 6.0
    cfg_exp: float = 5.0

    def __post_init__(self):
        self.dit = VideoDiT(self.dit_config)
        self.vae = VideoVAE(self.vae_config)
        # full 1000-step zero-SNR alpha ladder for training-time indexing:
        # index 0 = noisiest (matches DiscreteDenoiser's flipped sigmas)
        ladder, t_ids = zero_snr_alphas_sqrt(self.num_timesteps, self.num_timesteps)
        self.alpha_sqrt_ladder = jnp.asarray(ladder[:-1])  # drop the appended 1.0
        self.ladder_t_ids = jnp.asarray(t_ids[:-1])
        self._jit_dit_apply = None

    def dit_apply(self, params, x, t, cond):
        """One jitted DiT forward, shared by every sampler step: the samplers
        are python loops, so without this each of the 50 steps dispatches the
        42-layer graph op-by-op. Params are an argument (not a closure), so
        TP-sharded params drive GSPMD sharding of the whole forward."""
        if self._jit_dit_apply is None:
            self._jit_dit_apply = jax.jit(
                lambda p, xx, tt, cc: self.dit.apply({"params": p}, xx, tt, cc))
        return self._jit_dit_apply(params, x, t, cond)

    def shard_for_generation(self, params, vae_params, mesh):
        """Place params for a TP/DP-meshed generation run: DiT params follow
        their flax logical axes ('heads'/'mlp' -> 'model' — the TPU answer to
        the reference's CPU<->GPU 5B offload ping-pong,
        gen_refine_pi2v_long.py:203-239), VAE params replicate. Loaded (plain)
        trees get their specs from an eval_shape of init_params."""
        from jax.sharding import NamedSharding, PartitionSpec
        import flax.linen as nn

        from fluidnexus_tpu.parallel.mesh import param_shardings

        has_meta = any(isinstance(x, nn.meta.AxisMetadata)
                       for x in jax.tree.leaves(
                           params, is_leaf=lambda x: isinstance(x, nn.meta.AxisMetadata)))
        ref = params if has_meta else jax.eval_shape(
            lambda: self.init_params(jax.random.PRNGKey(0)))
        shardings = param_shardings(ref, mesh)
        params = jax.device_put(params, shardings)
        if vae_params is not None:
            vae_params = jax.device_put(vae_params, NamedSharding(mesh, PartitionSpec()))
        return params, vae_params

    # --------------------------------- init ---------------------------------

    def init_params(self, rng):
        c = self.dit_config
        latents = jnp.zeros((1, c.latent_frames, c.in_channels, c.latent_height, c.latent_width))
        txt = jnp.zeros((1, c.text_length, c.text_hidden_size))
        return self.dit.init(rng, latents, jnp.zeros((1,), jnp.int32), txt)["params"]

    def init_vae_params(self, rng, frames=5, height=32, width=32):
        x = jnp.zeros((1, frames, height, width, self.vae_config.in_channels))
        return self.vae.init({"params": rng}, x)["params"]

    # ------------------------------ first stage ------------------------------

    def encode_first_stage(self, vae_params, frames, rng=None, chunk: int = 0):
        """frames: (B,T,H,W,C) in [-1,1] -> latents (B,T',H',W',Cz).
        chunk > 0 encodes in cache-carried temporal chunks of that many
        latent frames (vae3d.chunked_encode) — required for real 480x720
        clips on one 16 GiB chip; 0 = whole clip in one graph (exact)."""
        if chunk > 0:
            from fluidnexus_tpu.diffusion.video.vae3d import chunked_encode

            return chunked_encode(self.vae, vae_params, frames, chunk=chunk,
                                  rng=rng, sample=rng is not None)
        z, _ = self.vae.apply({"params": vae_params}, frames, rng,
                              method=self.vae.encode, mutable=["cache"])
        return z

    def decode_first_stage(self, vae_params, z, chunk: int = 2,
                           spatial_tiles: int = 1, first_latents=None):
        """Chunked (and optionally width-tiled) decode. spatial_tiles > 1 +
        first_latents=1 is the single-16GiB-chip recipe for the real 480x720
        geometry (see vae3d.spatial_tiled_decode)."""
        if spatial_tiles > 1:
            from fluidnexus_tpu.diffusion.video.vae3d import spatial_tiled_decode

            return spatial_tiled_decode(self.vae, vae_params, z, chunk=chunk,
                                        first_latents=first_latents,
                                        tiles=spatial_tiles)
        return chunked_decode(self.vae, vae_params, z, chunk=chunk,
                              first_latents=first_latents)

    # --------------------------------- loss ---------------------------------

    def loss_fn(self, params, latents, text_emb, rng, is_i2v: bool = True):
        """latents: (B,T,C,H,W) scaled x0. Returns (scalar_loss, aux)."""
        b = latents.shape[0]
        k_idx, k_noise = jax.random.split(rng)
        idx = jax.random.randint(k_idx, (b,), 0, self.num_timesteps)
        a = self.alpha_sqrt_ladder[idx]
        t_ids = self.ladder_t_ids[idx]
        noise = jax.random.normal(k_noise, latents.shape)

        a_d = append_dims(a, latents.ndim)
        s_d = append_dims(jnp.sqrt(1 - a**2), latents.ndim)
        noised = latents * a_d + noise * s_d
        if is_i2v and self.fixed_frames > 0:
            noised = jnp.concatenate(
                [latents[:, : self.fixed_frames], noised[:, self.fixed_frames:]], 1)

        denoiser = VDenoiser(lambda x, t, c: self.dit.apply({"params": params}, x, t, c))
        denoised = denoiser(noised, a, t_ids, text_emb)
        w = append_dims(1.0 / jnp.maximum(1 - a**2, 1e-8), latents.ndim)
        per_sample = jnp.mean((w * (denoised - latents) ** 2).reshape(b, -1), -1)
        return per_sample.mean(), {"idx": idx, "per_sample": per_sample}

    # -------------------------------- sampling -------------------------------

    def sample(
        self,
        params,
        shape,
        text_emb,
        uc_text_emb=None,
        rng=None,
        num_steps: int = 50,
        frames_z=None,
        sdedit_strength: Optional[float] = None,
        prefix_clean_frames=None,
        cfg_scale: Optional[float] = None,
    ):
        """(SATVideoDiffusionEngine.sample, diffusion_video.py:242-289)"""
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape)
        denoiser = VDenoiser(lambda xx, t, c: self.dit_apply(params, xx, t, c))
        guider = DynamicCFG(scale=cfg_scale or self.cfg_scale, exp=self.cfg_exp,
                            num_steps=num_steps)
        return sample_dpmpp2m_sde(
            denoiser, x, cond=text_emb, uc=uc_text_emb, num_steps=num_steps,
            guider=guider, rng=rng, num_timesteps=self.num_timesteps,
            frames_z=frames_z, sdedit_strength=sdedit_strength,
            prefix_clean_frames=prefix_clean_frames, fixed_frames=self.fixed_frames,
            sdedit_prefix=False,
        )


def freeze_non_lora(grads, params=None):
    """Zero gradients of everything but LoRA params (the reference's
    disable_untrainable_params, diffusion_video.py:105-127)."""

    def mask(path, g):
        # note: flax Partitioned boxes append a '.value' GetAttrKey, so check
        # the whole path, not just the leaf name
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        return g if ("lora_a" in names or "lora_b" in names) else jnp.zeros_like(g)

    return jax.tree_util.tree_map_with_path(mask, grads)


def lora_partition(params):
    """Split the param tree into (lora, base) with identical structure —
    non-members replaced by None (jax treats None as an empty subtree).
    Differentiating w.r.t. ONLY the lora tree never materializes base-param
    cotangents: at 5B that is ~10.4 GiB of gradients the freeze_non_lora
    path would allocate and then zero. Recombine with lora_merge."""

    def is_lora(path):
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        return "lora_a" in names or "lora_b" in names

    lora = jax.tree_util.tree_map_with_path(
        lambda p, v: v if is_lora(p) else None, params)
    base = jax.tree_util.tree_map_with_path(
        lambda p, v: None if is_lora(p) else v, params)
    return lora, base


def lora_merge(lora, base):
    """Inverse of lora_partition (None leaves come from the other tree)."""
    return jax.tree.map(lambda a, b: a if b is None else b,
                        base, lora,
                        is_leaf=lambda x: x is None)
