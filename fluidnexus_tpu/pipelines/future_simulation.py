"""Future prediction: no-grad PBF rollout from the last reconstructed frame.

Parity target: FluidDynamics/entries_fluid_nexus/future_simulation.py
(predict:25-234): load last-frame hidden+visual checkpoint, rest-density decay
from p0_future back to p0 over decay_frames_future_p0, per-frame emit -> guess
(wind-aware) -> solver -> confirm -> advect visual -> render all cameras ->
checkpoint. The reference's ball-object path calls an UNDEFINED
project_object_red_ball_constraints (future_simulation.py:150 — latent crash);
here the object is a proper rigid-body constraint (sphere at the reference's
object center) so the path works.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.core.config import Config, dump_config, parse_cli
from fluidnexus_tpu.data.scene import cameras_by_time, read_scene
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig
from fluidnexus_tpu.pipelines.train_physical_particle import pbf_params_from_config
from fluidnexus_tpu.sim.pbf import (
    RigidBody, RigidSpec, confirm_guess, create_rigid_body, project_rigid_constraints,
    project_rigid_constraints_visual, remove_invalid, update_visual,
)
from fluidnexus_tpu.pipelines.train_physical_particle import solver_tick
from fluidnexus_tpu.splat.dynamics import (
    BackgroundSplats, EmitterPoints, constant_visual_attrs, emit_hidden, emit_visual,
    load_hidden, load_visual, pad_emission, plan_emission, remove_bottom_visual, save_hidden,
    save_visual,
)
from fluidnexus_tpu.splat.render import render_particles_with_background

# reference object-ball geometry (gm_background.create_from_pcd:139-143)
OBJECT_BALL_CENTER = (0.328, 0.378, -0.28)
OBJECT_BALL_RADIUS = 0.11


def predict(cfg: Config, scene_info=None, log=print, save_renders: bool = True):
    import dataclasses

    o, m = cfg.optim, cfg.model
    params = pbf_params_from_config(cfg)
    raster_cfg = RasterizerConfig(tile_capacity=cfg.pipe.tile_capacity,
        tile_x=cfg.pipe.tile_x, tile_y=cfg.pipe.tile_y, dup_x=cfg.pipe.dup_x,
                                  dup_y=cfg.pipe.dup_y, chunk=cfg.pipe.chunk,
                                  backend=cfg.pipe.backend)
    rng = np.random.default_rng(cfg.seed)
    if scene_info is None:
        scene_info = read_scene(cfg)
    train_by_t = cameras_by_time(scene_info.train_cameras)
    test_by_t = cameras_by_time(scene_info.test_cameras)
    n_frames = len(train_by_t)

    bg = None
    if m.bg_load_path:
        ply = os.path.join(m.bg_load_path, "point_cloud",
                           f"iteration_{m.bg_load_iteration:05d}", "point_cloud.ply")
        bg = BackgroundSplats.from_ply(ply)

    # load last reconstructed frame (ref :95-102)
    load_ckpt = os.path.join(m.load_path, "checkpoint")
    visual_ckpt = load_ckpt
    if o.use_level_two_in_future and m.level_two_load_path:
        visual_ckpt = os.path.join(m.level_two_load_path, "checkpoint_level_two")
    last = n_frames - 1
    state = load_hidden(load_ckpt, last, m.hidden_capacity, params)
    use_smoothed = {k: getattr(o, f"use_smoothed_{k}") for k in
                    ("color", "scales", "opacity", "rotation")} \
        if o.use_level_two_smoothed_in_future else None
    visual, attrs = load_visual(
        visual_ckpt, last, m.visual_capacity,
        channels=3 if (o.use_level_two_in_future and m.level_two_color_3ch) else 1,
        smoothed_window=o.smoothed_window_size if use_smoothed else None,
        use_smoothed=use_smoothed,
        scale=not (o.use_level_two_in_future and m.level_two_load_path != ""),
    )
    if not o.use_level_two_in_future:
        attrs = constant_visual_attrs(m.visual_capacity, channels=1)
    log(f"loaded frame {last}: hidden={int(state.num_alive)} visual={int(visual.num_alive)}")

    emitters = EmitterPoints.from_config(m, is_future=True)
    hid_cap = max(int(np.ceil(o.emit_ratio_hidden)) * max(len(emitters.hidden), 1),
                  len(emitters.hidden_first), 1)
    vis_cap = max(int(np.ceil(o.emit_ratio_visual)) * max(len(emitters.visual), 1),
                  len(emitters.visual_first), 1)

    rigid: Optional[RigidBody] = None
    if o.rigid_since >= 0:
        spec = RigidSpec(kind=o.rigid_body, particle_radius=o.rigid_particle_radius,
                         center=tuple(o.rigid_body_center), cuboid_num=tuple(o.rigid_cuboid_num),
                         sphere_radius=o.rigid_sphere_radius, sphere_num=o.rigid_sphere_num,
                         cylinder_radius=o.rigid_cylinder_radius,
                         cylinder_num=tuple(o.rigid_cylinder_num))
        rigid = create_rigid_body(spec, rng)
    object_ball = None
    if m.capture_part == "ball":
        # the fixed red-ball obstacle of the Ball capture (see module docstring)
        object_ball = create_rigid_body(
            RigidSpec(kind="sphere", sphere_radius=OBJECT_BALL_RADIUS * params.scale_factor,
                      sphere_num=1000, center=OBJECT_BALL_CENTER), rng)

    out_ckpt = os.path.join(m.model_path, "checkpoint") if m.model_path else None
    render_dir = os.path.join(m.model_path, "training_render") if m.model_path else None

    p0_recon, p0_future = params.p0, o.p0_future
    frames = []
    for fut in range(o.future_pred_frames):
        frame_idx = n_frames + fut
        # rest-density decay back toward reconstruction p0 (ref :123)
        cur_p0 = p0_future + (p0_recon - p0_future) * (1 - min(1, fut / max(o.decay_frames_future_p0, 1)))
        cur_params = dataclasses.replace(params, p0=cur_p0)

        state = remove_invalid(state, cur_params)
        if fut == 0:
            visual = remove_bottom_visual(visual)

        # NOTE: emit_new_particles's future_time_index<2 "first lattice"
        # branch is dead code in the reference (future_simulation.py:137 calls
        # it with the default -1, and prepare_emitter_future_first_points is
        # commented out at :105) — so the normal ratio path runs every frame.
        nh, hm = pad_emission(plan_emission(emitters.hidden, o.emit_ratio_hidden, rng), hid_cap)
        nv, vm = pad_emission(plan_emission(emitters.visual, o.emit_ratio_visual, rng), vis_cap)
        state = emit_hidden(state, nh, o.init_hidden_velocity, o.alpha, mask=hm)
        visual = emit_visual(visual, nv, mask=vm)

        use_wind = o.wind_since >= 0 and frame_idx >= o.wind_since
        use_rigid = rigid if (o.rigid_since >= 0 and frame_idx >= o.rigid_since) else None
        state, diags = solver_tick(state, cur_params, o.solver_iterations_future, use_wind)
        if object_ball is not None:
            state = project_rigid_constraints(state, object_ball, cur_params)
        if use_rigid is not None:
            state = project_rigid_constraints(state, use_rigid, cur_params)
        state = confirm_guess(state, cur_params)
        visual = update_visual(visual, state, cur_params)
        if use_rigid is not None:
            visual = project_rigid_constraints_visual(visual, use_rigid, cur_params)
        if object_ball is not None:
            visual = project_rigid_constraints_visual(visual, object_ball, cur_params)

        # render every camera of frame 0's rig (ref :180-227)
        if render_dir and save_renders:
            from fluidnexus_tpu.pipelines.train_background import save_image

            for cam in train_by_t[0] + test_by_t.get(0, []):
                out = render_particles_with_background(
                    visual.xyz / cur_params.scale_factor, visual.alive, attrs, bg,
                    view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
                    tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                    width=cam.width, height=cam.height,
                    bg_color=jnp.zeros(3 if bg is not None else attrs.color.shape[-1]),
                    config=raster_cfg,
                )
                save_image(os.path.join(
                    render_dir, f"render_frame{frame_idx:03d}_{cam.image_name}_0000.png"),
                    out.color)

        if out_ckpt:
            save_hidden(state, cur_params, out_ckpt, frame_idx)
            save_visual(visual, attrs, out_ckpt, frame_idx)
        frames.append({"frame": frame_idx, "p0": cur_p0,
                       "hidden": int(state.num_alive), "visual": int(visual.num_alive),
                       "p_ratio": float(np.asarray(diags["p_ratio"])[-1])})
        log(f"future {fut}: p0={cur_p0:.3f} hidden={int(state.num_alive)} "
            f"visual={int(visual.num_alive)}")
    return frames


def main(argv=None):
    cfg = parse_cli(argv, description="future simulation rollout")
    if cfg.model.model_path:
        dump_config(cfg, os.path.join(cfg.model.model_path, "cfg_args.json"))
    frames = predict(cfg)
    print(f"done: {len(frames)} future frames")


if __name__ == "__main__":
    main()
