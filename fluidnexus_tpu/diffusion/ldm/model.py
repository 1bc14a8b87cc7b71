"""Novel-view latent diffusion model (Zero123-class): UNet + KL-VAE + CLIP
image conditioning + relative-pose projection, with DDPM training loss and
DDIM sampling.

Parity targets:
  - Zero123/ldm/models/diffusion/ddpm.py LatentDiffusion:517 — hybrid
    conditioning: crossattn = cc_projection(concat(CLIP(cond_img), dT)) with
    cc_projection = Linear(772->768) identity+zeros init (:564-567); concat =
    VAE-mode latent of the cond image -> 8-channel UNet input (:786-834);
    CFG dropout 5% prompt-only / 5% image-only / 5% both (:813-827);
    eps-prediction, linear-sqrt beta schedule;
  - Zero123/helpers/camera_utils.py get_T:17-32 — spherical pose delta
    [d_theta, sin d_az, cos d_az, d_radius];
  - Zero123/ldm/models/diffusion/ddim.py DDIMSampler — 50 steps, eta,
    classifier-free guidance.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.diffusion.ldm.autoencoder import AutoencoderKL, KLVAEConfig
from fluidnexus_tpu.diffusion.ldm.clip import CLIPVisionConfig, CLIPVisionTower
from fluidnexus_tpu.diffusion.ldm.unet import UNet, UNetConfig
from fluidnexus_tpu.diffusion.schedules import DiffusionSchedule, append_dims


def cartesian_to_spherical(xyz):
    xy = xyz[..., 0] ** 2 + xyz[..., 1] ** 2
    z = np.sqrt(xy + xyz[..., 2] ** 2)
    theta = np.arctan2(np.sqrt(xy), xyz[..., 2])
    azimuth = np.arctan2(xyz[..., 1], xyz[..., 0])
    return theta, azimuth, z


def get_pose_delta(target_rt: np.ndarray, cond_rt: np.ndarray) -> np.ndarray:
    """[d_theta, sin d_az, cos d_az, d_radius] (camera_utils.get_T:17-32).
    target_rt/cond_rt: (3,4) world->cam [R|T]."""
    r, t = target_rt[:3, :3], target_rt[:, -1]
    t_target = -r.T @ t
    r, t = cond_rt[:3, :3], cond_rt[:, -1]
    t_cond = -r.T @ t
    th_c, az_c, z_c = cartesian_to_spherical(t_cond[None])
    th_t, az_t, z_t = cartesian_to_spherical(t_target[None])
    d_theta = float(np.asarray(th_t - th_c).reshape(()))
    d_az = float(np.asarray((az_t - az_c) % (2 * math.pi)).reshape(()))
    d_z = float(np.asarray(z_t - z_c).reshape(()))
    return np.array([d_theta, math.sin(d_az), math.cos(d_az), d_z], np.float32)


def plms_eps_prime(e_t, hist, n_hist: int):
    """Adams-Bashforth eps extrapolation of PLMS (plms.py:246-253). hist is
    newest-first [e_{t-1}, e_{t-2}, e_{t-3}]; n_hist in {1,2,3} selects the
    2nd/3rd/4th-order rule."""
    if n_hist == 1:
        return (3 * e_t - hist[0]) / 2
    if n_hist == 2:
        return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12
    return (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24


@dataclasses.dataclass
class NovelViewModel:
    unet_config: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae_config: KLVAEConfig = dataclasses.field(default_factory=KLVAEConfig)
    clip_config: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    num_timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012

    def __post_init__(self):
        self.unet = UNet(self.unet_config)
        self.vae = AutoencoderKL(self.vae_config)
        self.clip = CLIPVisionTower(self.clip_config)
        self.cc_projection = _CCProjection()
        self.schedule = DiffusionSchedule.create(
            self.num_timesteps, self.linear_start, self.linear_end)
        self.sqrt_ac = jnp.asarray(self.schedule.sqrt_alphas_cumprod())
        self.sqrt_1mac = jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod())

    # ------------------------------ init ------------------------------------

    @property
    def downsample_factor(self):
        return 2 ** (len(self.vae_config.ch_mult) - 1)

    def init_params(self, rng, image_size=256):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        lat = image_size // self.downsample_factor
        unet_p = self.unet.init(k1, jnp.zeros((1, lat, lat, self.unet_config.in_channels)),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, self.unet_config.context_dim)))["params"]
        vae_p = self.vae.init({"params": k2}, jnp.zeros((1, image_size, image_size, 3)))["params"]
        clip_p = self.clip.init(k3, jnp.zeros((1, 224, 224, 3)))["params"]
        cc_p = self.cc_projection.init(k4, jnp.zeros((1, 1, 772)))["params"]
        return {"unet": unet_p, "vae": vae_p, "clip": clip_p, "cc": cc_p}

    # --------------------------- conditioning --------------------------------

    def conditioning(self, params, cond_image, pose_delta, rng=None, cfg_dropout=False):
        """cond_image (B,H,W,3) in [0,1]; pose_delta (B,4).
        Returns (context (B,1,768), concat_latent (B,h,w,4)).
        With cfg_dropout, applies the reference's 5/5/5 scheme (ddpm.py:813-827)."""
        clip_emb = self.clip.apply({"params": params["clip"]}, cond_image)  # (B,768)
        concat = self.vae.apply({"params": params["vae"]}, cond_image * 2 - 1,
                                method=self.vae.encode)
        if cfg_dropout and rng is not None:
            b = cond_image.shape[0]
            k1, k2 = jax.random.split(rng)
            r = jax.random.uniform(k1, (b,))
            drop_prompt = (r < 0.10)                    # 5% prompt-only + 5% both
            drop_image = (r >= 0.05) & (r < 0.15)       # 5% image-only + 5% both
            clip_emb = jnp.where(drop_prompt[:, None], 0.0, clip_emb)
            concat = jnp.where(drop_image[:, None, None, None], 0.0, concat)
        ctx = self.cc_projection.apply(
            {"params": params["cc"]},
            jnp.concatenate([clip_emb[:, None, :], pose_delta[:, None, :]], -1))
        return ctx, concat

    # ------------------------------- loss ------------------------------------

    def loss_fn(self, params, target_image, cond_image, pose_delta, rng):
        """eps-prediction MSE (LatentDiffusion.p_losses). target/cond images
        (B,H,W,3) in [0,1]."""
        k_enc, k_t, k_noise, k_drop = jax.random.split(rng, 4)
        z = self.vae.apply({"params": params["vae"]}, target_image * 2 - 1,
                           rngs={"params": k_enc}, method=self.vae.encode,
                           rng=k_enc, sample=True)
        ctx, concat = self.conditioning(params, cond_image, pose_delta, k_drop, cfg_dropout=True)
        b = z.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape)
        z_t = append_dims(self.sqrt_ac[t], z.ndim) * z + append_dims(self.sqrt_1mac[t], z.ndim) * noise
        x_in = jnp.concatenate([z_t, concat], -1)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t, ctx)
        return jnp.mean((eps - noise) ** 2)

    # ------------------------------ sampling ---------------------------------


    # --------------------- shared sampler scaffolding ------------------------

    def _sampler_setup(self, params, cond_image, pose_delta, num_steps,
                       eta, cfg_scale, image_size, rng):
        """Shared DDIM/PLMS scaffolding: doubled CFG conditioning, the
        timestep/alpha ladder, the batched cond+uncond eps fn, and the
        initial noise. Returns (model_eps, ladder dict, x0, rng)."""
        b = cond_image.shape[0]
        lat = image_size // self.downsample_factor
        ctx, concat = self.conditioning(params, cond_image, pose_delta)
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], 0)
        concat2 = jnp.concatenate([concat, jnp.zeros_like(concat)], 0)

        times = np.linspace(0, self.num_timesteps - 1, num_steps).astype(int)[::-1].copy()
        ac = np.asarray(self.schedule.alphas_cumprod, np.float64)
        a_t = ac[times]
        a_prev = np.concatenate([ac[times[1:]], [1.0]])
        sigma = eta * np.sqrt((1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev))
        dir_coef = np.sqrt(np.maximum(1 - a_prev - sigma**2, 0.0))
        ladder = dict(times=times, a_t=a_t, a_prev=a_prev, sigma=sigma,
                      dir_coef=dir_coef)

        def model_eps(x, t):
            tv = jnp.full((2 * b,), t, jnp.int32)
            x2 = jnp.concatenate([x, x], 0)
            eps2 = self.unet.apply({"params": params["unet"]},
                                   jnp.concatenate([x2, concat2], -1), tv, ctx2)
            eps_c, eps_u = jnp.split(eps2, 2, 0)
            return eps_u + cfg_scale * (eps_c - eps_u)

        rng, k0 = jax.random.split(rng)
        x0 = jax.random.normal(k0, (b, lat, lat, self.unet_config.out_channels))
        return model_eps, ladder, x0, rng

    def _decode_unit(self, params, x):
        img = self.vae.apply({"params": params["vae"]}, x, method=self.vae.decode)
        return jnp.clip((img + 1) / 2, 0.0, 1.0)

    def ddim_sample(self, params, cond_image, pose_delta, rng, num_steps=50,
                    cfg_scale=3.0, eta=1.0, image_size=256):
        """DDIMSampler.sample with CFG (helpers/test_helpers.py:38-66: S=50,
        scale 3.0, eta 1.0). Returns decoded images (B,H,W,3) in [0,1].

        TPU shape: ONE lax.scan over the step schedule (the reference loops
        in Python with two UNet launches per step; under jit that unrolled
        into a 100-UNet-instance graph with minutes of compile) and cond +
        uncond batched into a single batch-2B UNet pass per step."""
        model_eps, lad, x0, rng = self._sampler_setup(
            params, cond_image, pose_delta, num_steps, eta, cfg_scale,
            image_size, rng)
        xs = (jnp.asarray(lad["times"], jnp.int32),
              jnp.asarray(lad["a_t"], jnp.float32), jnp.asarray(lad["a_prev"], jnp.float32),
              jnp.asarray(lad["sigma"], jnp.float32), jnp.asarray(lad["dir_coef"], jnp.float32),
              jnp.arange(num_steps, dtype=jnp.int32))

        def step(x, inp):
            t, at, ap, sg, dc, i = inp
            eps = model_eps(x, t)
            pred_x0 = (x - jnp.sqrt(1 - at) * eps) / jnp.sqrt(at)
            noise = sg * jax.random.normal(jax.random.fold_in(rng, i), x.shape)
            return jnp.sqrt(ap) * pred_x0 + dc * eps + noise, None

        x, _ = jax.lax.scan(step, x0, xs)
        return self._decode_unit(params, x)

    def plms_sample(self, params, cond_image, pose_delta, rng, num_steps=50,
                    cfg_scale=3.0, image_size=256):
        """PLMSSampler.sample (ldm/models/diffusion/plms.py:218-260): the
        eta=0 DDIM update driven by Adams-Bashforth-extrapolated eps (orders
        2-4, improved Euler + one extra UNet call on the first step). Unused
        by the FluidNexus configs (they sample DDIM) — provided for
        reference API completeness. One lax.scan; the eps history rides the
        carry, lax.switch picks the multistep order."""
        model_eps, lad, x0, rng = self._sampler_setup(
            params, cond_image, pose_delta, num_steps, 0.0, cfg_scale,
            image_size, rng)
        times = lad["times"]
        t_next = np.concatenate([times[1:], [times[-1]]])  # plms.py:160-164
        xs = (jnp.asarray(times, jnp.int32), jnp.asarray(t_next, jnp.int32),
              jnp.asarray(lad["a_t"], jnp.float32), jnp.asarray(lad["a_prev"], jnp.float32),
              jnp.asarray(lad["dir_coef"], jnp.float32))  # eta=0 -> sqrt(1-a_prev)

        def step(carry, inp):
            x, hist, n = carry
            t, tn, at, ap, dc = inp

            def x_prev(e):
                pred_x0 = (x - jnp.sqrt(1 - at) * e) / jnp.sqrt(at)
                return jnp.sqrt(ap) * pred_x0 + dc * e

            e_t = model_eps(x, t)

            def euler(_):
                # first step: Pseudo Improved Euler (plms.py:242-246)
                e_next = model_eps(x_prev(e_t), tn)
                return (e_t + e_next) / 2

            e_prime = jax.lax.switch(
                jnp.minimum(n, 3),
                [euler,
                 lambda _: plms_eps_prime(e_t, hist, 1),
                 lambda _: plms_eps_prime(e_t, hist, 2),
                 lambda _: plms_eps_prime(e_t, hist, 3)], None)
            hist = jnp.concatenate([e_t[None], hist[:2]], 0)
            return (x_prev(e_prime), hist, n + 1), None

        hist0 = jnp.zeros((3,) + x0.shape, x0.dtype)
        (x, _, _), _ = jax.lax.scan(step, (x0, hist0, jnp.int32(0)), xs)
        return self._decode_unit(params, x)


class _CCProjection(nn.Module):
    """Linear(772->768), identity over the CLIP block, zero bias
    (ddpm.py:564-567); trained at 10x LR (:1628-1635)."""

    @nn.compact
    def __call__(self, x):
        def init_eye(key, shape, dtype=jnp.float32):
            w = jnp.zeros(shape, dtype)
            return w.at[:768, :768].set(jnp.eye(768, dtype=dtype))

        kernel = self.param("kernel", init_eye, (772, 768))
        bias = self.param("bias", nn.initializers.zeros, (768,))
        return x @ kernel + bias
