"""Level-two appearance fit — per-frame optimization of visual-particle
color / opacity / scale / rotation with temporal-consistency losses.

Parity target: FluidDynamics/entries_fluid_nexus/train_visual_particle.py
(train:28-253): load each frame's level-one visual positions (world units,
scale=False), optionally init scales from KNN distances and inherit previous
attrs, fit against RGB images with L1+DSSIM + per-attribute consistency vs the
previous frame + scale-anisotropy regularizer, save per-frame npys.
"""
from __future__ import annotations

import functools

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.core.config import Config, dump_config, parse_cli
from fluidnexus_tpu.core.optim import adam_init, adam_step
from fluidnexus_tpu.data.scene import cameras_by_time, read_scene
from fluidnexus_tpu.ops.knn import mean_dist_to_knn
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig
from fluidnexus_tpu.pipelines.train_physical_particle import _cam_tensors, _gts, map_cameras
from fluidnexus_tpu.splat.dynamics import BackgroundSplats, VisualAttrs, load_visual, save_visual
from fluidnexus_tpu.splat.render import render_particles_with_background
from fluidnexus_tpu.utils.losses import l1_loss, ssim


def init_scales_from_knn(visual, attrs: VisualAttrs, enabled: bool) -> VisualAttrs:
    """(init_quantities_current_level_two, gm_dynamics.py:399-414: scales =
    clamp(log sqrt(distCUDA2), -10, 1))."""
    if not enabled:
        return attrs
    d2 = jnp.maximum(mean_dist_to_knn(visual.xyz, alive=visual.alive), 1e-7)
    s = jnp.clip(jnp.log(jnp.sqrt(d2)), -10.0, 1.0)
    scales = jnp.where(visual.alive[:, None], jnp.repeat(s[:, None], 3, 1), attrs.scales)
    return attrs._replace(scales=scales)


def inherit_prev(attrs: VisualAttrs, prev: Optional[VisualAttrs], o) -> VisualAttrs:
    """Inherit previous-frame attrs for the first prev-N particles
    (init_quantities_current_level_two, gm_dynamics.py:405-414). With static
    capacities the previous frame's rows line up by index."""
    if prev is None:
        return attrs
    upd = {}
    if o.fit_color and o.inherit_prev_color:
        upd["color"] = prev.color
    if o.fit_opacity and o.inherit_prev_opacity:
        upd["opacity"] = prev.opacity
    if o.fit_scales and o.inherit_prev_scales:
        upd["scales"] = prev.scales
    if o.fit_rotation and o.inherit_prev_rotation:
        upd["rotation"] = prev.rotation
    return attrs._replace(**upd)


def make_level_two_step(bg, raster_cfg, width, height, o, fit_fields):
    lambda_cons = dict(color=o.lambda_consistency_color, opacity=o.lambda_consistency_opacity,
                       scales=o.lambda_consistency_scales, rotation=o.lambda_consistency_rotation)

    # NB: ``trainable``'s leaves alias ``fixed_attrs`` (same arrays passed in
    # both) so arg 0 cannot be donated; the Adam state is donation-safe.
    @functools.partial(jax.jit, donate_argnums=(6,))
    def step(trainable, fixed_attrs: VisualAttrs, prev_attrs: VisualAttrs, has_prev,
             visual_xyz, alive, opt, cams, gts, lrs):
        def loss_fn(tr):
            attrs = fixed_attrs._replace(**tr)

            def one(cam_view, cam_proj, fovs, gt):
                out = render_particles_with_background(
                    visual_xyz, alive, attrs, bg,
                    view_matrix=cam_view, proj_matrix=cam_proj,
                    tan_fovx=fovs[0], tan_fovy=fovs[1], width=width, height=height,
                    bg_color=jnp.zeros(3 if bg is not None else attrs.color.shape[-1]),
                    config=raster_cfg,
                )
                img = out.color
                if img.shape[0] == 1 and gt.shape[0] == 3:
                    img = jnp.repeat(img, 3, axis=0)  # gray particles vs RGB gt
                l1v = l1_loss(img, gt)
                return (1.0 - o.lambda_dssim) * l1v * o.lambda_image + \
                    o.lambda_dssim * (1.0 - ssim(img, gt)) * o.lambda_image, l1v

            losses, l1s = map_cameras(one, cams, gts)
            loss = losses.mean()
            n_alive = jnp.maximum(alive.sum(), 1)
            for f in fit_fields:
                if lambda_cons[f] > 0:
                    cons = jnp.sum(jnp.where(alive[:, None],
                                             (tr[f] - getattr(prev_attrs, f)) ** 2, 0.0))
                    cons = cons / (n_alive * tr[f].shape[-1])
                    loss = loss + lambda_cons[f] * cons * has_prev
            if "scales" in fit_fields and o.lambda_reg_scaling > 0:
                s = jnp.exp(tr["scales"])
                ratio = s.max(-1) / jnp.maximum(s.min(-1), 1e-12)
                reg = jnp.where(alive, jnp.maximum(ratio - o.scaling_reg_ratio_threshold, 0.0), 0.0)
                loss = loss + o.lambda_reg_scaling * reg.sum() / n_alive
            return loss, l1s.mean()

        (loss, l1v), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        grads = {k: jnp.where(alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
                 for k, v in grads.items()}
        new, opt = adam_step(trainable, grads, opt, lrs)
        return new, opt, loss, l1v

    return step


def train(cfg: Config, scene_info=None, log=print, writer=None):
    o, m = cfg.optim, cfg.model
    raster_cfg = RasterizerConfig(tile_capacity=cfg.pipe.tile_capacity,
        tile_x=cfg.pipe.tile_x, tile_y=cfg.pipe.tile_y, dup_x=cfg.pipe.dup_x,
                                  dup_y=cfg.pipe.dup_y, chunk=cfg.pipe.chunk,
                                  backend=cfg.pipe.backend)
    rng = np.random.default_rng(cfg.seed)
    if scene_info is None:
        scene_info = read_scene(cfg)
    train_by_t = cameras_by_time(scene_info.train_cameras)
    n_frames = len(train_by_t)
    cam0 = train_by_t[0][0]
    width, height = cam0.width, cam0.height
    channels = 3 if m.level_two_color_3ch else 1

    bg = None
    if m.bg_load_path:
        ply = os.path.join(m.bg_load_path, "point_cloud",
                           f"iteration_{m.bg_load_iteration:05d}", "point_cloud.ply")
        bg = BackgroundSplats.from_ply(ply)

    load_dir = os.path.join(m.load_path, "checkpoint")
    out_dir = os.path.join(m.model_path, "checkpoint_level_two") if m.model_path else None

    fit_fields = tuple(f for f, on in (
        ("color", o.fit_color), ("opacity", o.fit_opacity),
        ("scales", o.fit_scales), ("rotation", o.fit_rotation)) if on)
    lrs = {f: jnp.asarray(lr, jnp.float32) for f, lr in (
        ("color", o.visual_color_lr), ("opacity", o.visual_opacity_lr),
        ("scales", o.visual_scales_lr), ("rotation", o.visual_rotation_lr)) if f in fit_fields}

    step = make_level_two_step(bg, raster_cfg, width, height, o, fit_fields)

    prev: Optional[VisualAttrs] = None
    results = []
    for t in range(n_frames):
        # level-one saves world-unit visual_xyz (scale=True on save =>
        # divided); here loaded unscaled (ref :107 scale=False)
        visual, attrs = load_visual(load_dir, t, m.visual_capacity, channels=channels,
                                    scale=False)
        attrs = init_scales_from_knn(visual, attrs, o.fit_scales and o.init_scales_w_xyz_dist)
        attrs = inherit_prev(attrs, prev, o)

        trainable = {f: getattr(attrs, f) for f in fit_fields}
        opt = adam_init(trainable)
        prev_in = prev if prev is not None else attrs
        has_prev = jnp.asarray(1.0 if prev is not None else 0.0)

        cams = train_by_t[t]
        cviews, cprojs, cfovs = _cam_tensors(cams)
        gts = _gts(cams, 3 if bg is not None or channels == 3 else 1)

        iters_min, iters_max = o.iterations_per_time_current_level_two, o.iterations_per_time_current_level_two_max
        iters = int(iters_min + (iters_max - iters_min) * t / n_frames)
        for it in range(1, iters + 1):
            sel = rng.choice(len(cams), size=min(o.batch, len(cams)), replace=False)
            trainable, opt, loss, l1v = step(
                trainable, attrs, prev_in, has_prev, visual.xyz, visual.alive, opt,
                (cviews[sel], cprojs[sel], cfovs[sel]), gts[sel], lrs)

        attrs = attrs._replace(**trainable)
        prev = attrs
        results.append({"frame": t, "loss": float(loss), "l1": float(l1v)})
        if writer:
            writer.add_scalar("level_two/loss", float(loss), t)
            writer.add_scalar("level_two/l1", float(l1v), t)
        log(f"level-two frame {t}/{n_frames-1}: loss={float(loss):.5f}")
        if out_dir:
            save_visual(visual, attrs, out_dir, t, scale=False)
    return results


def main(argv=None):
    cfg = parse_cli(argv, description="train visual particles (level two)")
    writer = None
    if cfg.model.model_path:
        dump_config(cfg, os.path.join(cfg.model.model_path, "cfg_args.json"))
        from fluidnexus_tpu.utils.tb import TrainLogger

        writer = TrainLogger(cfg.model.model_path)
    results = train(cfg, writer=writer)
    print(f"done: {len(results)} frames")


if __name__ == "__main__":
    main()
