"""Video diffusion sampling: ZeroSNR discretization, v-pred denoiser,
DDIM and VP-SDE DPM-Solver++(2M) with SDEdit entry and prefix clamping,
DynamicCFG guidance.

Parity targets (CogVideoX/sgm/modules/diffusionmodules/):
  - discretizer.py ZeroSNRDDPMDiscretization (SNR shift + zero terminal SNR)
  - denoiser.py DiscreteDenoiser (v-parameterization -> x0)
  - sampling.py VideoDDIMSampler:488 / VPSDEDPMPP2MSampler:589-740, including
    the SDEdit start (noise the input latents at sdedit_index, :677-714),
    clean-prefix re-pasting at every step (:716-717,737-738), and the
    fixed_frames prefix re-noising path (:695-706)
  - guiders.py DynamicCFG (cosine-ramped guidance scale)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.diffusion.schedules import DiffusionSchedule, append_dims


def zero_snr_alphas_sqrt(num_steps: int, num_timesteps: int = 1000,
                         linear_start: float = 0.00085, linear_end: float = 0.012,
                         shift_scale: float = 1.0):
    """sqrt(alpha_cumprod) ladder for `num_steps` sampling steps, SNR-shifted
    and rescaled to zero terminal SNR (ZeroSNRDDPMDiscretization.get_sigmas).
    Returns (alpha_sqrt ascending in alpha i.e. sigma high->low? — the
    reference returns sigmas low-alpha first) and the matching timestep ids.
    Order matches the reference: index 0 = noisiest."""
    sched = DiffusionSchedule.create(num_timesteps, linear_start, linear_end)
    ac = sched.alphas_cumprod
    ac = ac / (shift_scale + (1 - shift_scale) * ac)  # SNR shift
    if num_steps < num_timesteps:
        timesteps = np.linspace(num_timesteps - 1, 0, num_steps, endpoint=False).astype(int)[::-1]
        ac = ac[timesteps]
    else:
        timesteps = np.arange(num_timesteps)
    s = np.sqrt(ac)
    s0, sT = s[0], s[-1]
    s = (s - sT) * s0 / (s0 - sT)
    # reference flips: sigmas returned noisiest-first; after the sampler's
    # append-of-one, alpha_sqrt[i] ascends to 1
    alpha_sqrt = s[::-1].copy()
    t_ids = timesteps[::-1].copy()
    return np.concatenate([alpha_sqrt, [1.0]]), np.concatenate([t_ids, [-1]]).astype(np.int32)


@dataclasses.dataclass
class VDenoiser:
    """v-prediction -> x0 (DiscreteDenoiser + VScaling): network sees x_t and
    the discrete timestep; denoised = sqrt(abar) x_t - sqrt(1-abar) v."""

    apply_fn: Callable  # (latents, t, cond) -> v

    def __call__(self, x, alpha_sqrt, t_idx, cond):
        alpha_sqrt = jnp.asarray(alpha_sqrt, jnp.float32)
        sigma = jnp.sqrt(1.0 - alpha_sqrt**2)
        t = jnp.broadcast_to(jnp.asarray(t_idx, jnp.int32).reshape(-1), (x.shape[0],))
        v = self.apply_fn(x, t, cond)
        a = append_dims(jnp.asarray(alpha_sqrt), x.ndim)
        s = append_dims(sigma, x.ndim)
        return a * x - s * v


@dataclasses.dataclass
class DynamicCFG:
    """Guidance scale ramped as 1 + scale*(1-cos(pi*(step/num)**exp))/2
    (guiders.py:58-76)."""

    scale: float = 6.0
    exp: float = 5.0
    num_steps: int = 50

    def __call__(self, x_uncond, x_cond, step_index):
        s = 1 + self.scale * (1 - math.cos(math.pi * (float(step_index) / self.num_steps) ** self.exp)) / 2
        return x_uncond + s * (x_cond - x_uncond)


@dataclasses.dataclass
class VanillaCFG:
    scale: float = 6.0

    def __call__(self, x_uncond, x_cond, step_index):
        return x_uncond + self.scale * (x_cond - x_uncond)


def _denoise_cfg(denoiser, guider, x, alpha_sqrt, t_idx, cond, uc, step_index,
                 sequential=False):
    if uc is None:
        return denoiser(x, alpha_sqrt, t_idx, cond)
    if sequential:
        # two passes at half the peak activation memory — for memory-tight
        # single-chip configs where the batch-2 joint forward doesn't fit
        dc = denoiser(x, alpha_sqrt, t_idx, cond)
        du = denoiser(x, alpha_sqrt, t_idx, uc)
        return guider(du, dc, step_index)
    # ONE batch-2 forward for cond+uncond instead of two sequential passes
    # (the reference runs them separately, gen_refine_pi2v_long offload
    # path): halves kernel launches and doubles the matmul batch — identical
    # numerics, the DiT has no cross-batch ops
    xx = jnp.concatenate([x, x], axis=0)
    cc = jnp.concatenate([cond, uc], axis=0)
    d = denoiser(xx, alpha_sqrt, t_idx, cc)
    dc, du = jnp.split(d, 2, axis=0)
    return guider(du, dc, step_index)


def sample_ddim(denoiser, x, cond, uc=None, num_steps=50, guider=None, rng=None,
                num_timesteps=1000, cfg_sequential=False):
    """VideoDDIMSampler.__call__ (:556-585): deterministic DDIM in
    alpha-sqrt space: x' = a_t x + b_t denoised."""
    alpha_sqrt, t_ids = zero_snr_alphas_sqrt(num_steps, num_timesteps)
    guider = guider or DynamicCFG(num_steps=num_steps)
    for i in range(num_steps):
        a, a_next = alpha_sqrt[i], alpha_sqrt[i + 1]
        denoised = _denoise_cfg(denoiser, guider, x, a, t_ids[i], cond, uc,
                                num_steps - i, sequential=cfg_sequential)
        a_t = math.sqrt((1 - a_next**2) / max(1 - a**2, 1e-12))
        b_t = a_next - a * a_t
        x = a_t * x + b_t * denoised
    return x


def sample_dpmpp2m_sde(
    denoiser,
    x,
    cond,
    uc=None,
    num_steps=50,
    guider=None,
    rng=None,
    num_timesteps=1000,
    frames_z=None,
    sdedit_strength: Optional[float] = None,
    prefix_clean_frames=None,
    fixed_frames: int = 0,
    sdedit_prefix: bool = False,
    cfg_sequential: bool = False,
):
    """VPSDEDPMPP2MSampler.__call__ (sampling.py:660-740).

    frames_z + sdedit_strength: start from noised input latents at
    sdedit_index = round((steps)(1-strength)). prefix_clean_frames: re-pasted
    over the first frames at EVERY step (the long-video chaining trick).
    fixed_frames/sdedit_prefix: the training-time prefix handling.
    """
    assert rng is not None, "stochastic sampler needs an rng"
    alpha_sqrt, t_ids = zero_snr_alphas_sqrt(num_steps, num_timesteps)
    guider = guider or DynamicCFG(num_steps=num_steps)
    num_sigmas = num_steps + 1

    sdedit_index = 0
    if frames_z is not None and sdedit_strength is not None and 0.0 <= sdedit_strength <= 1.0:
        sdedit_index = max(round((num_sigmas - 1) * (1.0 - sdedit_strength)), 0)

    prefix_frames = x[:, :fixed_frames] if fixed_frames > 0 else None
    cur_fix = prefix_clean_frames.shape[1] if prefix_clean_frames is not None else 0

    old_denoised = None
    for i in range(num_steps):
        if i < sdedit_index:
            continue
        a = float(alpha_sqrt[i])
        a_next = float(alpha_sqrt[i + 1])
        rng, k1, k2, k3 = jax.random.split(rng, 4)

        if prefix_frames is not None:
            if sdedit_prefix:
                noise = jax.random.normal(k3, prefix_frames.shape)
                noised = a * prefix_frames + noise * math.sqrt(1 - a**2)
                x = jnp.concatenate([noised, x[:, fixed_frames:]], 1)
            else:
                x = jnp.concatenate([prefix_frames, x[:, fixed_frames:]], 1)

        if sdedit_index > 0 and i == sdedit_index:
            noise = jax.random.normal(k1, frames_z.shape)
            x = a * frames_z + noise * math.sqrt(1 - a**2)

        if prefix_clean_frames is not None:
            x = jnp.concatenate([prefix_clean_frames, x[:, cur_fix:]], 1)

        denoised = _denoise_cfg(denoiser, guider, x, a, t_ids[i], cond, uc,
                                num_steps - i, sequential=cfg_sequential)
        idx = num_steps - i
        if idx == 1:
            x, old_denoised = denoised, denoised
            continue

        # DPM-Solver++(2M) SDE in lambda = log(alpha/sigma) space (:589-657).
        # alpha=0 at the zero-SNR terminal step -> lambda=-inf; clamp like the
        # torch log would produce a large-negative value
        def lam(a_sq):
            return math.log(max(math.sqrt(a_sq**2 / max(1 - a_sq**2, 1e-12)), 1e-20))

        h = lam(a_next) - lam(a)
        mult1 = math.sqrt((1 - a_next**2) / max(1 - a**2, 1e-12)) * math.exp(-h)
        mult2 = math.expm1(-2 * h) * a_next
        mult_noise = math.sqrt(1 - a_next**2) * math.sqrt(max(1 - math.exp(-2 * h), 0.0))
        noise = jax.random.normal(k2, x.shape)

        if old_denoised is None or a_next < 1e-14:
            x = mult1 * x - mult2 * denoised + mult_noise * noise
        else:
            a_prev = float(alpha_sqrt[i - 1]) if i > 0 else None
            h_last = lam(a) - lam(a_prev)
            r = h_last / h
            mult3 = 1 + 1 / (2 * r)
            mult4 = 1 / (2 * r)
            denoised_d = mult3 * denoised - mult4 * old_denoised
            x = mult1 * x - mult2 * denoised_d + mult_noise * noise
        old_denoised = denoised

    if prefix_frames is not None:
        x = jnp.concatenate([prefix_frames, x[:, fixed_frames:]], 1)
    if prefix_clean_frames is not None:
        x = jnp.concatenate([prefix_clean_frames, x[:, cur_fix:]], 1)
    return x
