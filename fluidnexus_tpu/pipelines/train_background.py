"""Background 3DGS training — stage 1 of the reconstruction pipeline.

Parity target: FluidDynamics/entries_fluid_nexus/train_background.py:30-279
(random-camera L1+DSSIM loss with optional scale-anisotropy regularizer,
densify/prune/opacity-reset schedule, domain prunes, PLY + camera-pose
outputs). TPU redesign: the whole optimizer step (render + loss + grads +
Adam) is ONE jitted function over static-capacity buffers; densification is a
second jitted function invoked on schedule; images stream host->device.

CLI: python -m fluidnexus_tpu.pipelines.train_background --config <json> ...
"""
from __future__ import annotations

import functools

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.core.config import Config, dump_config, parse_cli
from fluidnexus_tpu.core.optim import adam_init, adam_step
from fluidnexus_tpu.core.ply import save_background_ply
from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.data.readers import SceneInfo
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from fluidnexus_tpu.splat.background import (
    BackgroundModel, BackgroundParams, add_densification_stats, create_from_points,
    densify_and_prune, prune_large_points, prune_near_cam_points, prune_near_points,
    reset_opacity,
)
from fluidnexus_tpu.utils.losses import l1_loss, psnr, ssim
from fluidnexus_tpu.utils.maths import expon_lr, get_world_to_view

TRAINABLE = ("xyz", "color", "scaling", "rotation", "opacity")


def _trainable(model: BackgroundModel):
    return {k: getattr(model, k) for k in TRAINABLE}


def make_train_step(width: int, height: int, raster_cfg: RasterizerConfig,
                    lambda_dssim: float, lambda_reg_scaling: float,
                    scaling_reg_ratio_threshold: float):
    """Build the jitted (model, adam, camera, gt, lrs) -> step function."""

    core = _make_step_core(width, height, raster_cfg, lambda_dssim,
                           lambda_reg_scaling, scaling_reg_ratio_threshold)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(model: BackgroundModel, opt, cam_view, cam_proj, cam_fovs, gt, bg, lrs):
        return core(model, opt, cam_view, cam_proj, cam_fovs, gt, bg, lrs)

    return step


def _make_step_core(width: int, height: int, raster_cfg: RasterizerConfig,
                    lambda_dssim: float, lambda_reg_scaling: float,
                    scaling_reg_ratio_threshold: float):
    def step(model: BackgroundModel, opt, cam_view, cam_proj, cam_fovs, gt, bg, lrs):
        params = _trainable(model)
        xy_off = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(p, xy_off):
            m = model._replace(**p)
            out = rasterize(
                m.xyz, m.color, jax.nn.sigmoid(m.opacity), jnp.exp(m.scaling),
                m.rotation / jnp.linalg.norm(m.rotation, axis=-1, keepdims=True).clip(1e-12),
                alive=m.alive, xy_offset=xy_off,
                view_matrix=cam_view, proj_matrix=cam_proj,
                tan_fovx=cam_fovs[0], tan_fovy=cam_fovs[1],
                width=width, height=height, bg_color=bg, config=raster_cfg,
            )
            l1v = l1_loss(out.color, gt)
            ssim_v = 1.0 - ssim(out.color, gt)
            loss = (1.0 - lambda_dssim) * l1v + lambda_dssim * ssim_v
            if lambda_reg_scaling > 0:
                s = jnp.exp(model._replace(**p).scaling)
                ratio = s.max(-1) / jnp.maximum(s.min(-1), 1e-12)
                reg = jnp.where(model.alive, jnp.maximum(ratio - scaling_reg_ratio_threshold, 0.0), 0.0)
                loss = loss + lambda_reg_scaling * reg.sum() / jnp.maximum(model.alive.sum(), 1)
            return loss, (out.radii, l1v, out.color)

        (loss, (radii, l1v, img)), grads = jax.value_and_grad(
            lambda p_and_off: loss_fn(p_and_off[0], p_and_off[1]), has_aux=True
        )((params, xy_off))
        pgrads, xy_grad = grads
        new_params, opt = adam_step(params, pgrads, opt, lrs)
        model = model._replace(**new_params)
        model = add_densification_stats(model, xy_grad, radii)
        return model, opt, loss, l1v, img

    return step


def make_train_scan(width: int, height: int, raster_cfg: RasterizerConfig,
                    lambda_dssim: float, lambda_reg_scaling: float,
                    scaling_reg_ratio_threshold: float,
                    views, projs, fovss, gts, fixed_lrs, base_key,
                    random_background: bool, background):
    """Device-side multi-step loop: ONE dispatch runs a whole chunk of
    optimizer iterations via ``lax.scan`` over per-step (camera index,
    iteration, position-lr) sequences. Between launches the host runs the
    densification / reset / prune / save events exactly where the reference
    does. This removes the per-iteration host dispatch that dominates small
    steps (the reference's python loop pays it every iteration)."""
    core = _make_step_core(width, height, raster_cfg, lambda_dssim,
                           lambda_reg_scaling, scaling_reg_ratio_threshold)
    n_ch = background.shape[0]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi(model, opt, cam_seq, it_seq, lr_xyz_seq):
        def body(carry, x):
            model, opt = carry
            ci, it, lr_xyz = x
            if random_background:  # static flag
                bg = jax.random.uniform(jax.random.fold_in(base_key, it), (n_ch,))
            else:
                bg = jnp.asarray(background, jnp.float32)
            lrs = dict(fixed_lrs, xyz=lr_xyz)
            model, opt, loss, l1v, _ = core(
                model, opt, views[ci], projs[ci], fovss[ci], gts[ci], bg, lrs)
            return (model, opt), (loss, l1v)

        (model, opt), (losses, l1s) = jax.lax.scan(
            body, (model, opt), (cam_seq, it_seq, lr_xyz_seq))
        return model, opt, losses, l1s

    return multi


def render_view(model: BackgroundModel, cam: Camera, bg, raster_cfg: RasterizerConfig):
    return rasterize(
        model.xyz, model.color, model.get_opacity, model.get_scaling, model.get_rotation,
        alive=model.alive,
        view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        width=cam.width, height=cam.height, bg_color=bg, config=raster_cfg,
    )


def save_image(path, img_chw):
    from PIL import Image

    arr = np.asarray(jnp.clip(img_chw, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.squeeze() if arr.shape[2] == 1 else arr).save(path)


def train(cfg: Config, scene_info: SceneInfo, writer=None,
          bg_params: Optional[BackgroundParams] = None, log_every: int = 100):
    o, m = cfg.optim, cfg.model
    bp = bg_params or BackgroundParams(
        percent_dense=o.percent_dense,
        position_lr_init=o.position_lr_init, position_lr_final=o.position_lr_final,
        position_lr_delay_mult=o.position_lr_delay_mult, position_lr_max_steps=o.position_lr_max_steps,
        color_lr=o.color_lr, opacity_lr=o.opacity_lr, scaling_lr=o.scaling_lr,
        rotation_lr=o.rotation_lr, densify_grad_threshold=o.densify_grad_threshold,
    )
    raster_cfg = RasterizerConfig(
        tile_capacity=cfg.pipe.tile_capacity,
        tile_x=cfg.pipe.tile_x, tile_y=cfg.pipe.tile_y, dup_x=cfg.pipe.dup_x, dup_y=cfg.pipe.dup_y,
        chunk=cfg.pipe.chunk, backend=cfg.pipe.backend,
    )

    cams = scene_info.train_cameras
    assert cams, "no training cameras"
    extent = scene_info.nerf_normalization["radius"]
    width, height = cams[0].width, cams[0].height

    model = create_from_points(scene_info.point_cloud, bp)
    opt = adam_init(_trainable(model))

    num_channel = 3
    background = jnp.ones(num_channel) if m.white_background else jnp.zeros(num_channel)

    # camera poses dump (train_background.py:75-89)
    if m.model_path:
        poses = []
        gl_trans = []
        for c in cams:
            w2c = get_world_to_view(c.R, c.T)
            c2w = np.linalg.inv(w2c)
            poses.append(c2w)
            c2w_gl = c2w.copy()
            c2w_gl[:3, 1:3] *= -1
            gl_trans.append(c2w_gl[:3, 3])
        os.makedirs(m.model_path, exist_ok=True)
        np.save(os.path.join(m.model_path, "gs_all_cam_poses.npy"), np.stack(poses))
        cam_locations = np.stack(gl_trans)
    else:
        cam_locations = np.stack([c.camera_center for c in cams])

    step_fn = make_train_step(width, height, raster_cfg, o.lambda_dssim,
                              o.lambda_reg_scaling, o.scaling_reg_ratio_threshold)

    # pre-stage per-camera tensors; images stream per step
    cam_tensors = [
        (jnp.asarray(c.world_view), jnp.asarray(c.full_proj),
         np.array([c.tan_fovx, c.tan_fovy], np.float32)) for c in cams
    ]

    def gt_of(c: Camera):
        img = c.image
        if img.ndim == 2:
            img = img[..., None]
        return jnp.asarray(img.transpose(2, 0, 1))

    rng = np.random.default_rng(cfg.seed)
    order: List[int] = []
    ema = 0.0
    key = jax.random.PRNGKey(cfg.seed)
    t0 = time.time()

    # ---- device-side multi-step launches ------------------------------------
    # host events (densify / reset / prune / save) all fire at interval
    # boundaries, so a lax.scan chunk can always END exactly at the next one
    def host_event_at(j: int) -> bool:
        if j < o.densify_until_iter:
            if j > o.densify_from_iter and j % o.densification_interval == 0:
                return True
            if j % o.opacity_reset_interval == 0 or (m.white_background and j == o.densify_from_iter):
                return True
        for interval in (o.prune_near_interval, o.prune_near_cam_interval, o.prune_large_interval):
            if interval > 0 and j % interval == 0:
                return True
        return bool(m.model_path) and j in cfg.save_iterations

    same_shape = all(c.width == width and c.height == height for c in cams)
    chunk_cap = o.steps_per_launch if o.steps_per_launch > 0 else min(200, max(log_every, 1))
    multi_fn = None
    if chunk_cap > 1 and same_shape:
        views_s = jnp.stack([t[0] for t in cam_tensors])
        projs_s = jnp.stack([t[1] for t in cam_tensors])
        fovs_s = jnp.stack([jnp.asarray(t[2]) for t in cam_tensors])
        gts_s = jnp.stack([gt_of(c) for c in cams])
        fixed_lrs = dict(color=jnp.asarray(bp.color_lr), scaling=jnp.asarray(bp.scaling_lr),
                         rotation=jnp.asarray(bp.rotation_lr), opacity=jnp.asarray(bp.opacity_lr))
        multi_fn = make_train_scan(width, height, raster_cfg, o.lambda_dssim,
                                   o.lambda_reg_scaling, o.scaling_reg_ratio_threshold,
                                   views_s, projs_s, fovs_s, gts_s, fixed_lrs, key,
                                   bool(m.random_background), np.asarray(background, np.float32))

    def next_cam() -> int:
        nonlocal order
        if not order:
            order = list(rng.permutation(len(cams)))
        return order.pop()

    def lr_at(j: int) -> float:
        return expon_lr(j, bp.position_lr_init * extent, bp.position_lr_final * extent,
                        lr_delay_mult=bp.position_lr_delay_mult,
                        max_steps=bp.position_lr_max_steps)

    it = 0
    while it < o.iterations:
        # take the largest chunk that ends at (or before) the next host event
        n_take = 1
        if multi_fn is not None:
            n_take = min(chunk_cap, o.iterations - it)
            for j in range(it + 1, it + n_take):
                if host_event_at(j):
                    n_take = j - it
                    break

        if multi_fn is not None and n_take > 1:
            its = np.arange(it + 1, it + n_take + 1, dtype=np.int32)
            cam_seq = np.array([next_cam() for _ in its], np.int32)
            lr_seq = np.array([lr_at(int(j)) for j in its], np.float32)
            model, opt, losses, l1s = multi_fn(model, opt, jnp.asarray(cam_seq),
                                               jnp.asarray(its), jnp.asarray(lr_seq))
            losses_np = l1s_np = None
            for j in its:
                if j % log_every == 0:
                    if losses_np is None:
                        losses_np, l1s_np = np.asarray(losses), np.asarray(l1s)
                    k_in = int(j - it - 1)
                    _guard_finite(float(losses_np[k_in]), int(j), model, m.model_path)
                    ema = 0.4 * float(losses_np[k_in]) + 0.6 * ema
                    if writer:
                        writer.add_scalar("train_loss/l1_loss", float(l1s_np[k_in]), int(j))
                        writer.add_scalar("train_loss/total_loss", float(losses_np[k_in]), int(j))
                        writer.add_scalar("points", int(model.num_alive), int(j))
        else:
            j = it + 1
            lrs = dict(xyz=jnp.asarray(lr_at(j), jnp.float32),
                       color=jnp.asarray(bp.color_lr), scaling=jnp.asarray(bp.scaling_lr),
                       rotation=jnp.asarray(bp.rotation_lr), opacity=jnp.asarray(bp.opacity_lr))
            ci = next_cam()
            view, proj, fovs = cam_tensors[ci]
            bg = jax.random.uniform(jax.random.fold_in(key, j), (num_channel,)) \
                if m.random_background else background
            model, opt, loss, l1v, img = step_fn(model, opt, view, proj, fovs,
                                                 gt_of(cams[ci]), bg, lrs)
            if j % log_every == 0:
                lossf = float(loss)
                _guard_finite(lossf, j, model, m.model_path)
                ema = 0.4 * lossf + 0.6 * ema
                if writer:
                    writer.add_scalar("train_loss/l1_loss", float(l1v), j)
                    writer.add_scalar("train_loss/total_loss", lossf, j)
                    writer.add_scalar("points", int(model.num_alive), j)

        it += n_take

        # densification schedule (train_background.py:236-253)
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                size_threshold = 20.0 if it > o.opacity_reset_interval else 0.0
                key, sub = jax.random.split(key)
                model, opt_mu, opt_nu, stats = densify_and_prune(
                    model, opt.mu, opt.nu, sub,
                    o.densify_grad_threshold, o.opacity_threshold, extent,
                    size_threshold, o.percent_dense, max_new=4096,
                )
                opt = opt._replace(mu=opt_mu, nu=opt_nu)
            if it % o.opacity_reset_interval == 0 or (m.white_background and it == o.densify_from_iter):
                model = reset_opacity(model)
        if o.prune_near_interval > 0 and it % o.prune_near_interval == 0:
            model = prune_near_points(model, o.valid_min_y, o.valid_max_z)
        if o.prune_near_cam_interval > 0 and it % o.prune_near_cam_interval == 0:
            model = prune_near_cam_points(model, cam_locations, (0.328, -0.04, -0.34))
        if o.prune_large_interval > 0 and it % o.prune_large_interval == 0:
            model = prune_large_points(model)

        if m.model_path and it in cfg.save_iterations:
            save(model, m.model_path, it)

    jax.block_until_ready(model.xyz)
    wall = time.time() - t0
    return model, dict(iterations=o.iterations, wall_s=wall, it_per_s=o.iterations / wall)


def _guard_finite(lossf: float, it: int, model, model_path: str):
    """Failure detection: a non-finite loss aborts the run with an emergency
    checkpoint instead of silently optimizing garbage (the reference has no
    such guard — SURVEY aux subsystems)."""
    if np.isfinite(lossf):
        return
    if model_path:
        try:
            save(model, model_path, it)
        except Exception:
            pass
    raise FloatingPointError(
        f"non-finite loss {lossf} at iteration {it}"
        + (f"; emergency checkpoint saved under {model_path}" if model_path else ""))


def save(model: BackgroundModel, model_path: str, iteration: int):
    """PLY save of alive Gaussians (scene.save -> gm_background.save_ply)."""
    alive = np.asarray(model.alive)
    out = os.path.join(model_path, f"point_cloud/iteration_{iteration}", "point_cloud.ply")
    save_background_ply(
        out,
        np.asarray(model.xyz)[alive], np.asarray(model.color)[alive],
        np.asarray(model.opacity)[alive], np.asarray(model.scaling)[alive],
        np.asarray(model.rotation)[alive],
    )
    return out


def evaluate(model: BackgroundModel, cameras: List[Camera], bg, raster_cfg) -> dict:
    """Held-out metrics (training_report parity, train_background.py:280-347)."""
    l1s, psnrs = [], []
    for c in cameras:
        out = render_view(model, c, bg, raster_cfg)
        gt = jnp.asarray(
            (c.image[..., None] if c.image.ndim == 2 else c.image).transpose(2, 0, 1)
        )
        img = jnp.clip(out.color, 0, 1)
        l1s.append(float(l1_loss(img, gt)))
        psnrs.append(float(psnr(img, gt)))
    return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}


def main(argv=None):
    cfg = parse_cli(argv, description="train background Gaussians")
    if cfg.detect_anomaly:  # --detect_anomaly parity (helper_parser.py:24,46)
        jax.config.update("jax_debug_nans", True)
    from fluidnexus_tpu.data.scene import read_scene

    cfg.model.is_bg = True
    scene_info = read_scene(cfg)
    writer = None
    if cfg.model.model_path:
        dump_config(cfg, os.path.join(cfg.model.model_path, "cfg_args.json"))
        from fluidnexus_tpu.utils.tb import TrainLogger

        writer = TrainLogger(cfg.model.model_path)
    model, stats = train(cfg, scene_info, writer)
    print(f"done: {stats}")


if __name__ == "__main__":
    main()
