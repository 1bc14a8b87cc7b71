"""Render pipes: camera + model -> image, composing fluid particles with the
frozen background splats.

Parity with FluidDynamics/renderer/ (render_dynamics pipe_dynamics.py:8-180,
render_fluid pipe_fluid.py:8, render_background pipe_background.py:9) and the
registry helpers/helper_pipe.py:1-48. The reference's two CUDA extensions
(ch1/ch3) collapse into the channel dimension here; grayscale particle colors
are repeated to 3 channels when composited with the RGB background
(pipe_dynamics.py:139-148).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from fluidnexus_tpu.splat.dynamics import BackgroundSplats, VisualAttrs
from fluidnexus_tpu.utils.maths import normalize


def render_particles_with_background(
    positions,                  # (N,3) fluid particle positions (world units)
    alive,                      # (N,)
    attrs: VisualAttrs,         # appearance (color (N,1) or (N,3))
    background: Optional[BackgroundSplats],
    *,
    view_matrix, proj_matrix, tan_fovx, tan_fovy, width: int, height: int,
    bg_color, config: RasterizerConfig, gpf_only: bool = False, gs_only: bool = False,
):
    """The render_dynamics compose path: concat fluid + background splats into
    one rasterize call (pipe_dynamics.py:51-57,139-154)."""
    color = attrs.color
    if background is not None and not gpf_only:
        if color.shape[-1] == 1:
            color = jnp.repeat(color, 3, axis=-1)
        if gs_only:
            means = background.xyz
            colors = background.color
            ops = jnp.clip(jnp.reciprocal(1 + jnp.exp(-background.opacity)), 0, 1)[:, 0]
            scales = jnp.exp(background.scaling)
            rots = normalize(background.rotation)
            alive_all = jnp.ones((means.shape[0],), bool)
        else:
            means = jnp.concatenate([positions, background.xyz], 0)
            colors = jnp.concatenate([color, background.color], 0)
            ops = jnp.concatenate(
                [jnp.clip(jnp.reciprocal(1 + jnp.exp(-attrs.opacity)), 0, 1)[:, 0],
                 jnp.clip(jnp.reciprocal(1 + jnp.exp(-background.opacity)), 0, 1)[:, 0]], 0)
            scales = jnp.concatenate([jnp.exp(attrs.scales), jnp.exp(background.scaling)], 0)
            rots = jnp.concatenate([normalize(attrs.rotation), normalize(background.rotation)], 0)
            alive_all = jnp.concatenate([alive, jnp.ones((background.xyz.shape[0],), bool)], 0)
    else:
        means = positions
        colors = color
        ops = jnp.clip(jnp.reciprocal(1 + jnp.exp(-attrs.opacity)), 0, 1)[:, 0]
        scales = jnp.exp(attrs.scales)
        rots = normalize(attrs.rotation)
        alive_all = alive

    return rasterize(
        means, colors, ops, scales, rots, alive=alive_all,
        view_matrix=view_matrix, proj_matrix=proj_matrix,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
        bg_color=bg_color, config=config,
    )


def to_gray(img):
    """Channel-mean, kept single-channel. L1/SSIM between two ``to_gray3``
    images equal the same losses on the 1-channel means (the repeated
    channels are identical), at a third of the image-loss cost — the fit
    steps compare in this space."""
    return img.mean(axis=0, keepdims=True)


def to_gray3(img):
    """Channel-mean then repeat x3 — the smoke losses compare gray images
    (train_physical_particle.py:127-133)."""
    g = to_gray(img)
    return jnp.concatenate([g, g, g], axis=0)


def render_gs_sh(
    model,                      # BackgroundModel with color = SH DC coefficients
    features_rest,              # (C, (deg+1)^2 - 1, 3) higher-order SH coeffs
    sh_degree: int,
    *,
    campos,
    view_matrix, proj_matrix, tan_fovx, tan_fovy, width: int, height: int,
    bg_color, config: RasterizerConfig,
):
    """gm_gs (vanilla 3DGS) render: view-dependent colors from spherical
    harmonics, evaluated OUTSIDE the rasterizer (the CUDA reference folds
    computeColorFromSH into its preprocess, forward.cu:60-68 — on TPU it is
    a fused elementwise op feeding the same rasterize call)."""
    from fluidnexus_tpu.ops.sh import sh_to_color

    sh = jnp.concatenate([model.color[:, None, :], features_rest], axis=1)
    colors = sh_to_color(sh_degree, sh, model.xyz, jnp.asarray(campos))
    return rasterize(
        model.xyz, colors, model.get_opacity[:, 0], model.get_scaling,
        model.get_rotation, alive=model.alive,
        view_matrix=view_matrix, proj_matrix=proj_matrix,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
        bg_color=bg_color, config=config,
    )
