"""Physical-particle reconstruction — the core FluidNexus stage.

Parity target: FluidDynamics/entries_fluid_nexus/train_physical_particle.py
(train:27-585): phase A fits first-frame visual particle positions against
multi-view images; phase B initializes + stabilizes hidden PBF particles;
phase C alternates simulation ticks with differentiable fitting of the
learnable hidden positions (``estimate_xyz_nn``) through the NN-advection
render path, with gas-constraint losses.

TPU redesign highlights:
  - every optimizer iteration (render + all 5 loss terms incl. two neighbor
    searches + Adam) is ONE compiled function, reused across frames (static
    capacities mean one compilation for the whole 120-frame run);
  - the O(V^2) cdist min-separation penalty becomes an exact neighbor-list
    sum over pairs within the threshold (same value, linear memory);
  - per-frame npy checkpoints keep the reference on-disk format.
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
from fluidnexus_tpu.core.optim import AdamState, adam_init, adam_step
from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.data.scene import cameras_by_time, read_scene
from fluidnexus_tpu.ops.neighbors import radius_graph
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig
from fluidnexus_tpu.sim.pbf_dense import project_gas_constraints_dense
from fluidnexus_tpu.sim.pbf import (
    PBFParams, confirm_guess, density_ratio_at, guess_from_nn, guess_hidden,
    project_gas_constraints, remove_invalid, splat_velocity_to_points, visual_xyz_from_nn,
    warn_capacity_overflow,
)
from fluidnexus_tpu.sim.state import ParticleState, VisualState, make_particle_state, make_visual_state
from fluidnexus_tpu.splat.dynamics import (
    BackgroundSplats, EmitterPoints, VisualAttrs, constant_visual_attrs, create_hidden_points,
    create_visual_points, emit_hidden, emit_visual, plan_emission, plan_extra_visual, save_hidden,
    save_visual,
)
from fluidnexus_tpu.splat.render import render_particles_with_background, to_gray, to_gray3
from fluidnexus_tpu.utils.losses import l1_loss, l2_loss, psnr, ssim
from fluidnexus_tpu.utils.maths import expon_lr


def pbf_params_from_config(cfg: Config) -> PBFParams:
    o = cfg.optim
    return PBFParams(
        secs=o.secs, alpha=o.alpha, beta=o.beta, buoyancy_decay_rate=o.buoyancy_decay_rate,
        buoyancy_max_y=o.buoyancy_max_y, h=o.H, p0=o.p0, k=o.k,
        min_neighbors=o.min_neighbors, knn_k=min(o.KNN_K, 128),
        init_hidden_velocity=o.init_hidden_velocity,
        wind_force=tuple(float(x) for x in o.wind_force), wind_power=o.wind_power,
    )


def map_cameras(one, cams, gts):
    """Unrolled per-camera map — value-identical to ``jax.vmap(one)(*cams, gts)``
    for an element-independent ``one``, but issues the raster pallas calls
    directly. vmap's batching of the custom-VJP raster lowers each kernel
    into a serial ``while`` loop on TPU (~8 ms/step of loop overhead at the
    2-camera recon workload); the camera count is static under jit, so a
    Python unroll emits the same kernels sequence-scheduled with no loop."""
    n = gts.shape[0]
    outs = [one(*(c[i] for c in cams), gts[i]) for i in range(n)]
    return tuple(jnp.stack([o[j] for o in outs]) for j in range(len(outs[0])))


def distance_penalty(positions, alive, threshold, k: int = 32):
    """Exact equivalent of utils/loss_utils.distance_loss:98 for pairs within
    the threshold, via neighbor lists instead of a dense cdist."""
    nl = radius_graph(jax.lax.stop_gradient(positions), threshold, k=k, loop=False, alive=alive)
    d = jnp.sqrt(jnp.maximum(jnp.sum(
        (positions[:, None] - positions[nl.idx]) ** 2, -1), 1e-20))
    pen = jnp.where(nl.mask, jnp.maximum(threshold - d, 0.0) ** 2, 0.0)
    return pen.sum()


def solver_tick(state: ParticleState, params: PBFParams, solver_iterations: int,
                use_wind: bool, stable: bool = False, dense: bool = True,
                grid_reuse: bool = True):
    """One simulation tick exactly as the reference schedules it
    (train_physical_particle.py:286-298): guess, counts = solver_iterations
    up-front (NOT incremental — :292-293), then N Jacobi projections.

    ``dense=True`` (default) runs the projections through the cell-pair MXU
    path (sim/pbf_dense.py — exact over all in-radius pairs, no knn_k
    truncation) with the grid built ONCE per tick and the whole Jacobi loop
    in slot space (pbf_dense.project_iterations_dense — the reference's
    per-iteration radius_graph rebuild is a GPU habit, not physics);
    ``dense=False`` keeps the padded-list path with the reference's
    arbitrary-first truncation. ``grid_reuse=False`` restores the
    rebuild-every-iteration schedule on the dense path."""
    state = guess_hidden(state, params, stable=stable, use_wind=use_wind)
    state = state._replace(counts=jnp.full_like(state.counts, float(solver_iterations)))
    if dense and grid_reuse:
        from fluidnexus_tpu.sim.pbf_dense import project_iterations_dense
        return project_iterations_dense(state, params, solver_iterations,
                                        counts_step=0.0)

    def body(st, _):
        if dense:
            st, diag = project_gas_constraints_dense(st, params)
        else:
            st, diag = project_gas_constraints(st, params)
        return st, diag

    state, diags = jax.lax.scan(body, state, None, length=solver_iterations)
    return state, diags


# ------------------------------- phase A step --------------------------------


def make_first_frame_step(bg: Optional[BackgroundSplats], raster_cfg, width, height,
                          lambda_dssim, lambda_first_distance, distance_threshold_visual,
                          channels: int, mesh=None):
    """Phase-A fit step. With ``mesh`` (a 'data'-axis Mesh), the camera batch
    is sharded one-sub-batch-per-chip (shard_map) and the position grads are
    ``psum``'d into one replicated Adam step — exact weighted-sum parity with
    the single-device step (tests/test_recon_dp.py). ``w`` carries per-camera
    weights (0 for padding slots when the batch doesn't divide by dp) and
    ``inv_w`` = 1 / (number of real cameras)."""
    dp = int(mesh.shape["data"]) if mesh is not None else 1

    def loss_fn(vxyz, alive, attrs, cams, gts, w, inv_w):
        def one(cam_view, cam_proj, fovs, gt):
            out = render_particles_with_background(
                vxyz, alive, attrs, bg,
                view_matrix=cam_view, proj_matrix=cam_proj,
                tan_fovx=fovs[0], tan_fovy=fovs[1], width=width, height=height,
                bg_color=jnp.zeros(3 if bg is not None else channels),
                config=raster_cfg,
            )
            # losses in 1-channel gray space: exactly equal to the reference's
            # gray-repeated-x3 comparison (identical channels), 3x cheaper
            img = to_gray(out.color)
            gtg = to_gray(gt)
            l1v = l1_loss(img, gtg)
            sv = 1.0 - ssim(img, gtg)
            return (1.0 - lambda_dssim) * l1v + lambda_dssim * sv, l1v

        losses, l1s = map_cameras(one, cams, gts)
        # weighted partial sums: psum over 'data' restores the global mean
        loss = (losses * w).sum() * inv_w
        if lambda_first_distance > 0:
            # camera-independent term: computed identically on every shard,
            # scaled by 1/dp so the psum restores the single value
            loss = loss + (lambda_first_distance / dp) * distance_penalty(
                vxyz, alive, distance_threshold_visual)
        return loss, (l1s * w).sum() * inv_w

    def grads(vxyz, alive, attrs, cams, gts, w, inv_w):
        (loss, l1v), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            vxyz, alive, attrs, cams, gts, w, inv_w)
        return loss, l1v, grad

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        inner = grads

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P()),
            out_specs=P(), check_vma=False)
        def grads(vxyz, alive, attrs, cams, gts, w, inv_w):
            loss, l1v, grad = inner(vxyz, alive, attrs, cams, gts, w, inv_w)
            return (jax.lax.psum(loss, "data"), jax.lax.psum(l1v, "data"),
                    jax.lax.psum(grad, "data"))

    @jax.jit
    def step(visual_xyz, alive, attrs: VisualAttrs, opt: AdamState, cams, gts, lr, w, inv_w):
        loss, l1v, grad = grads(visual_xyz, alive, attrs, cams, gts, w, inv_w)
        new, opt = adam_step({"xyz": visual_xyz}, {"xyz": grad}, opt, {"xyz": lr})
        return new["xyz"], opt, loss, l1v

    return step


# ------------------------------- phase C step --------------------------------


def make_current_frame_step(bg: Optional[BackgroundSplats], raster_cfg, width, height,
                            params: PBFParams, o, channels: int, mesh=None):
    """Phase-C fit step. ``mesh`` shards the camera batch over the 'data'
    axis (see make_first_frame_step); the camera-independent particle-space
    terms (exyz / gas / distance) run replicated, scaled by 1/dp so the grad
    psum is exact."""
    lambda_dssim = o.lambda_dssim
    dp = int(mesh.shape["data"]) if mesh is not None else 1

    def loss_fn(nn, state, visual, attrs, cams, gts, w, inv_w):
        # ONE dense-grid build at the nn positions, shared between the splat
        # advection (source side) and the gas-density loss — both evaluate at
        # nn * scale_factor with the same alive mask. stop_gradient on the
        # shared trees kills their (zero) cotangents at the boundary, so the
        # build graph is never transposed.
        grid_nn = planes_nn = None
        if jax.default_backend() == "tpu":
            from fluidnexus_tpu.ops.neighbors import build_dense_grid
            from fluidnexus_tpu.sim.pbf_pallas import _planes

            sg = jax.lax.stop_gradient
            pos_nn = sg(nn) * params.scale_factor
            grid_nn = jax.tree.map(sg, build_dense_grid(
                pos_nn, params.h, state.alive,
                params.dense_max_cells, params.dense_cell_capacity))
            planes_nn = jax.tree.map(sg, _planes(grid_nn))
        vxyz_scaled = visual_xyz_from_nn(visual.xyz, visual.alive, nn, state,
                                         params, grid=grid_nn, planes=planes_nn)
        vxyz_world = vxyz_scaled / params.scale_factor

        def one(cam_view, cam_proj, fovs, gt):
            out = render_particles_with_background(
                vxyz_world, visual.alive, attrs, bg,
                view_matrix=cam_view, proj_matrix=cam_proj,
                tan_fovx=fovs[0], tan_fovy=fovs[1], width=width, height=height,
                bg_color=jnp.zeros(3 if bg is not None else channels),
                config=raster_cfg,
            )
            # losses in 1-channel gray space: exactly equal to the reference's
            # gray-repeated-x3 comparison (identical channels), 3x cheaper
            img = to_gray(out.color)
            gtg = to_gray(gt)
            l1v = l1_loss(img, gtg)
            sv = 1.0 - ssim(img, gtg)
            return (1.0 - lambda_dssim) * l1v + lambda_dssim * sv, l1v

        img_losses, l1s = map_cameras(one, cams, gts)
        loss = o.lambda_image * (img_losses * w).sum() * inv_w
        aux = {"l1": (l1s * w).sum() * inv_w}

        if o.lambda_current_distance > 0:
            loss = loss + (o.lambda_current_distance / dp) * distance_penalty(
                vxyz_world, visual.alive, o.distance_threshold_visual)
        if o.lambda_exyz > 0:
            # masked MSE over alive particles (ref :371-373)
            diff = (nn * params.scale_factor - state.estimate_xyz) ** 2
            exyz_v = jnp.sum(jnp.where(state.alive[:, None], diff, 0.0)) / (
                jnp.maximum(state.alive.sum(), 1) * 3) / dp
            loss = loss + o.lambda_exyz * exyz_v
            aux["exyz"] = exyz_v
        if o.lambda_gas_constraints > 0:
            ratio = density_ratio_at(nn * params.scale_factor, state.alive,
                                     state.imass, params,
                                     grid=grid_nn, planes=planes_nn)
            gas_v = jnp.sum(jnp.where(state.alive, (ratio - 1.0) ** 2, 0.0)) / jnp.maximum(
                state.alive.sum(), 1) / dp
            loss = loss + o.lambda_gas_constraints * gas_v
            aux["gas"] = gas_v
        if o.lambda_next_gas_constraints > 0:
            nxt = guess_from_nn(nn, state, params)
            ratio2 = density_ratio_at(nxt, state.alive, state.imass, params)
            gas2_v = jnp.sum(jnp.where(state.alive, (ratio2 - 1.0) ** 2, 0.0)) / jnp.maximum(
                state.alive.sum(), 1) / dp
            loss = loss + o.lambda_next_gas_constraints * gas2_v
            aux["next_gas"] = gas2_v
        return loss, aux

    def grads(nn, state, visual, attrs, cams, gts, w, inv_w):
        (loss, aux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            nn, state, visual, attrs, cams, gts, w, inv_w)
        return loss, aux, grad

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        inner = grads

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P("data"), P("data"), P()),
            out_specs=P(), check_vma=False)
        def grads(nn, state, visual, attrs, cams, gts, w, inv_w):
            loss, aux, grad = inner(nn, state, visual, attrs, cams, gts, w, inv_w)
            psum = lambda t: jax.tree.map(lambda x: jax.lax.psum(x, "data"), t)  # noqa: E731
            return psum(loss), psum(aux), psum(grad)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(exyz_nn, opt: AdamState, state: ParticleState, visual: VisualState,
             attrs: VisualAttrs, cams, gts, lr, w, inv_w):
        loss, aux, grad = grads(exyz_nn, state, visual, attrs, cams, gts, w, inv_w)
        grad = jnp.where(state.alive[:, None], grad, 0.0)
        new, opt = adam_step({"nn": exyz_nn}, {"nn": grad}, opt, {"nn": lr})
        return new["nn"], opt, loss, aux

    return step


# ------------------------------- orchestration -------------------------------


def _cam_tensors(cams: List[Camera]):
    views = jnp.stack([jnp.asarray(c.world_view) for c in cams])
    projs = jnp.stack([jnp.asarray(c.full_proj) for c in cams])
    fovs = jnp.asarray([[c.tan_fovx, c.tan_fovy] for c in cams], jnp.float32)
    return views, projs, fovs


def _recon_mesh(cfg: Config):
    """'data'-axis mesh for camera data-parallelism (pipe.dp chips)."""
    if cfg.pipe.dp <= 1:
        return None
    from fluidnexus_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    if n < cfg.pipe.dp:
        raise ValueError(f"--dp {cfg.pipe.dp} but only {n} devices visible")
    return make_mesh(n_devices=cfg.pipe.dp, dp=cfg.pipe.dp, tp=1, time=1)


def _select_batch(rng, n_cams: int, batch: int, dp: int):
    """Camera mini-batch of size min(batch, n_cams), padded up to a multiple
    of dp with zero-weight repeats so the shard_map split is even. Returns
    (indices, weights, 1/realcount)."""
    b = min(batch, n_cams)
    sel = rng.choice(n_cams, size=b, replace=False)
    pad = (-b) % dp
    if pad:
        sel = np.concatenate([sel, np.repeat(sel[:1], pad)])
    w = np.concatenate([np.ones(b, np.float32), np.zeros(pad, np.float32)])
    # host arrays: they ride along as args of the single jitted fit-iteration
    # dispatch instead of being transferred by their own tiny executables
    return sel, w, np.float32(1.0 / b)


def _gts(cams: List[Camera], channels: int):
    out = []
    for c in cams:
        img = c.image
        if img.ndim == 2:
            img = img[..., None]
        if channels == 3 and img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
        out.append(img.transpose(2, 0, 1))
    return jnp.asarray(np.stack(out))


def train(cfg: Config, scene_info=None, writer=None, log=print, resume_from_frame: int = -1):
    """resume_from_frame >= 1 restarts phase C at that frame from the saved
    per-frame checkpoint (the reference cannot resume — SURVEY §5; here the
    npy format round-trips losslessly)."""
    o, m = cfg.optim, cfg.model
    params = pbf_params_from_config(cfg)
    raster_cfg = RasterizerConfig(
        tile_capacity=cfg.pipe.tile_capacity,
        tile_x=cfg.pipe.tile_x, tile_y=cfg.pipe.tile_y, dup_x=cfg.pipe.dup_x, dup_y=cfg.pipe.dup_y,
        chunk=cfg.pipe.chunk, backend=cfg.pipe.backend,
    )
    rng = np.random.default_rng(cfg.seed)

    if scene_info is None:
        scene_info = read_scene(cfg)
    train_by_t = cameras_by_time(scene_info.train_cameras)
    test_by_t = cameras_by_time(scene_info.test_cameras)
    n_frames = len(train_by_t)
    cam0 = train_by_t[0][0]
    width, height = cam0.width, cam0.height
    channels = 3  # render channel (num_channel, ref :42)

    bg = None
    if m.bg_load_path:
        ply = os.path.join(m.bg_load_path, "point_cloud",
                           f"iteration_{m.bg_load_iteration:05d}", "point_cloud.ply")
        bg = BackgroundSplats.from_ply(ply)
        log(f"loaded background: {bg.n} splats from {ply}")

    model_path = m.model_path
    ckpt_path = os.path.join(model_path, "checkpoint") if model_path else None

    if resume_from_frame >= 1:
        from fluidnexus_tpu.splat.dynamics import load_hidden, load_visual

        state = load_hidden(ckpt_path, resume_from_frame - 1, m.hidden_capacity, params)
        visual, attrs = load_visual(ckpt_path, resume_from_frame - 1, m.visual_capacity,
                                    channels=1)
        log(f"resumed from frame {resume_from_frame - 1}: "
            f"hidden={int(state.num_alive)} visual={int(visual.num_alive)}")
        return _phase_c(cfg, scene_info, state, visual, attrs, bg, raster_cfg, params,
                        rng, writer, log, ckpt_path, start_frame=resume_from_frame)

    # ---------------- phase A: first-frame visual fit (ref :82-184) ----------
    vis_pts = create_visual_points(m, rng)
    visual = make_visual_state(m.visual_capacity, jnp.asarray(vis_pts))
    attrs = constant_visual_attrs(m.visual_capacity, channels=1)

    mesh = _recon_mesh(cfg)
    stepA = make_first_frame_step(bg, raster_cfg, width, height, o.lambda_dssim,
                                  o.lambda_first_distance, o.distance_threshold_visual, channels,
                                  mesh=mesh)
    optA = adam_init({"xyz": visual.xyz})
    cviews, cprojs, cfovs = _cam_tensors(train_by_t[0])
    gts0 = _gts(train_by_t[0], channels)
    extent = scene_info.nerf_normalization["radius"]

    # ONE dispatch per fit iteration: the camera-batch gathers run inside the
    # same jitted call as the step. Host-driven `gts[sel]` / `views[sel]`
    # indexing dispatches 4+ extra tiny executables per iteration — measured
    # ~200 s/frame at the full-scale workload (~6x the step itself) through
    # the remote-relay dispatch path.
    @functools.partial(jax.jit, donate_argnums=(0, 3))
    def fitA(vxyz, alive, attrs, optA, sel, lr, w, inv_w):
        cams_b = (cviews[sel], cprojs[sel], cfovs[sel])
        return stepA(vxyz, alive, attrs, optA, cams_b, gts0[sel], lr, w, inv_w)

    vxyz = visual.xyz
    t0 = time.time()
    for it in range(1, o.iterations_per_time_first + 1):
        lr = expon_lr(it, o.position_lr_init * extent * o.pos_lr_scale_factor,
                      o.position_lr_final * extent,
                      lr_delay_mult=o.position_lr_delay_mult, max_steps=o.position_lr_max_steps)
        sel, w, inv_w = _select_batch(rng, len(train_by_t[0]), o.batch, cfg.pipe.dp)
        vxyz, optA, loss, l1v = fitA(vxyz, visual.alive, attrs, optA, sel,
                                     np.float32(lr), w, inv_w)
        if writer and it % 50 == 0:
            writer.add_scalar("train_loss_frame_000/total", float(loss), it)
    visual = visual._replace(xyz=vxyz)
    log(f"phase A done in {time.time()-t0:.1f}s loss={float(loss):.5f}")

    # detach_visual_and_scale (ref :188): visual positions now live in x100 space
    visual = visual._replace(xyz=visual.xyz * params.scale_factor)

    # ---------------- phase B: hidden init + stabilization (ref :190-228) ----
    hidden_pts = create_hidden_points(m)
    state = make_particle_state(m.hidden_capacity, jnp.asarray(hidden_pts),
                                init_velocity_y=o.init_hidden_velocity,
                                gravity_alpha_buoyancy=np.array([0, -9.8, 0]) * o.alpha)
    log(f"hidden init: {hidden_pts.shape[0]} particles")

    for _ in range(o.stable_iterations):
        state = remove_invalid(state, params)
        state, diags = solver_tick(state, params, o.solver_iterations, use_wind=False, stable=True)
        warn_capacity_overflow(diags, "phase B stabilization",
                               strict=cfg.strict_capacity, log=log)
        state = confirm_guess(state, params)
    if ckpt_path:
        save_hidden(state, params, ckpt_path, 0)
        save_visual(visual, attrs, ckpt_path, 0)

    return _phase_c(cfg, scene_info, state, visual, attrs, bg, raster_cfg, params,
                    rng, writer, log, ckpt_path, start_frame=1)


def _phase_c(cfg, scene_info, state, visual, attrs, bg, raster_cfg, params,
             rng, writer, log, ckpt_path, start_frame=1):
    """Phase C: per-frame simulate + fit (ref :244-469)."""
    o, m = cfg.optim, cfg.model
    train_by_t = cameras_by_time(scene_info.train_cameras)
    test_by_t = cameras_by_time(scene_info.test_cameras)
    n_frames = len(train_by_t)
    cam0 = train_by_t[0][0]
    width, height = cam0.width, cam0.height
    channels = 3
    extent = scene_info.nerf_normalization["radius"]

    emitters = EmitterPoints.from_config(m)
    mesh = _recon_mesh(cfg)
    stepC = make_current_frame_step(bg, raster_cfg, width, height, params, o, channels,
                                    mesh=mesh)

    # ONE dispatch per fit iteration: the camera-batch gathers run inside the
    # same jitted call as the step. Host-driven `gts[sel]` / `views[sel]`
    # indexing dispatches 4+ extra tiny executables per iteration — measured
    # ~200 s/frame (~6x the step itself) at the full-scale workload through
    # the remote-relay dispatch path. Compiled once; retraces only when the
    # camera count changes (sparse_views).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fitC(exyz_nn, optC, state, visual, attrs, cviews, cprojs, cfovs, gts,
             sel, lr, w, inv_w):
        cams_b = (cviews[sel], cprojs[sel], cfovs[sel])
        return stepC(exyz_nn, optC, state, visual, attrs, cams_b, gts[sel],
                     lr, w, inv_w)
    metrics_per_frame = []
    # static emission capacities so the jitted emit path compiles once
    hid_cap = max(int(np.ceil(o.emit_ratio_hidden)) * max(len(emitters.hidden), 1), 1)
    vis_cap = max(int(np.ceil(o.emit_ratio_visual)) * max(len(emitters.visual), 1), 1) + \
        max(int(m.visual_capacity * max(o.extra_visual_ratio, 0.02)), o.extra_visual_num,
            o.extra_visual_min_num, 64)

    for t in range(start_frame, n_frames):
        state = remove_invalid(state, params)
        use_wind = o.wind_since >= 0 and t >= o.wind_since

        from fluidnexus_tpu.splat.dynamics import pad_emission

        new_hidden, hmask = pad_emission(
            plan_emission(emitters.hidden, o.emit_ratio_hidden, rng), hid_cap)
        state = emit_hidden(state, new_hidden, o.init_hidden_velocity, o.alpha, mask=hmask)
        new_visual = plan_emission(emitters.visual, o.emit_ratio_visual, rng)
        extra = plan_extra_visual(np.asarray(visual.xyz), np.asarray(visual.alive),
                                  o.extra_visual_ratio, o.extra_visual_num,
                                  o.extra_visual_y_min, o.extra_visual_min_num,
                                  m.emitter_visual_delta, rng)
        new_v, vmask = pad_emission(np.concatenate([new_visual, extra], 0), vis_cap)
        visual = emit_visual(visual, new_v, mask=vmask)

        state, diags = solver_tick(state, params, o.solver_iterations, use_wind)
        warn_capacity_overflow(diags, f"frame {t} simulate",
                               strict=cfg.strict_capacity, log=log)
        if writer:
            for k, v in diags.items():
                writer.add_scalar(f"sim_frame_{t:03d}/{k}", float(np.asarray(v)[-1]), t)

        # trainable NN positions, down-scaled (training_setup_current, gm:372)
        exyz_nn = state.estimate_xyz / params.scale_factor
        optC = adam_init({"nn": exyz_nn})

        cur_cams = train_by_t[t]
        iters_min, iters_max = o.iterations_per_time_current, o.iterations_per_time_current_max
        iters = int(iters_min + (iters_max - iters_min) * t / n_frames)
        if 0 < o.sparse_views_from_time_index <= t:
            cur_cams = [c for c in cur_cams if c.image_name in o.sparse_views]
            iters = o.iterations_per_time_current_sparse

        cviews, cprojs, cfovs = _cam_tensors(cur_cams)
        gts = _gts(cur_cams, channels)

        for it in range(1, iters + 1):
            lr = expon_lr(it, o.position_lr_init * extent * o.pos_lr_scale_factor,
                          o.position_lr_final * extent,
                          lr_delay_mult=o.position_lr_delay_mult,
                          max_steps=o.position_lr_max_steps)
            sel, w, inv_w = _select_batch(rng, len(cur_cams), o.batch, cfg.pipe.dp)
            exyz_nn, optC, loss, aux = fitC(exyz_nn, optC, state, visual, attrs,
                                            cviews, cprojs, cfovs, gts, sel,
                                            np.float32(lr), w, inv_w)
        if writer:
            writer.add_scalar(f"train_loss_frame_{t:03d}/total", float(loss), t)

        # commit: confirm_from_nn + advect visual + wo_velocity (ref :456-458)
        new_visual_xyz = visual_xyz_from_nn(visual.xyz, visual.alive, exyz_nn, state, params)
        state = state._replace(estimate_xyz=jnp.where(
            state.alive[:, None], exyz_nn * params.scale_factor, state.estimate_xyz))
        visual = visual._replace(xyz=jnp.where(visual.alive[:, None], new_visual_xyz, visual.xyz))
        state = confirm_guess(state, params)

        frame_metrics = {"frame": t, "loss": float(loss),
                         "hidden": int(state.num_alive), "visual": int(visual.num_alive)}
        # held-out evaluation (training_report parity, ref :588-741)
        if test_by_t.get(t):
            ev, img0 = evaluate_frame(visual, attrs, bg, test_by_t[t], raster_cfg,
                                      return_image=True)
            frame_metrics.update(ev)
            if writer:
                for k, v in ev.items():
                    writer.add_scalar(f"test_frame_{t:03d}/{k}", v, t)
                if img0 is not None:
                    # rendered-grid parity with the reference's tb_writer
                    # add_images (train_physical_particle.py:699-741)
                    writer.add_image("render/test_view", img0, t)
        metrics_per_frame.append(frame_metrics)
        if not np.isfinite(float(loss)):
            raise FloatingPointError(
                f"non-finite loss at frame {t}; last good per-frame npy "
                f"checkpoints are under {ckpt_path or '(no model_path)'}")
        log(f"frame {t}/{n_frames-1}: loss={float(loss):.5f} "
            f"hidden={int(state.num_alive)} visual={int(visual.num_alive)}")
        if ckpt_path:
            save_hidden(state, params, ckpt_path, t)
            save_visual(visual, attrs, ckpt_path, t)

    return dict(state=state, visual=visual, attrs=attrs, background=bg,
                metrics=metrics_per_frame, params=params)


def evaluate_frame(visual: VisualState, attrs: VisualAttrs, bg, cams: List[Camera],
                   raster_cfg, scale_factor=100.0, scaled=True, return_image=False):
    """Held-out render metrics (training_report, ref :588-741): gray L1/PSNR
    vs supervision image and vs real capture."""
    out = {}
    first_img = None
    vxyz = visual.xyz / scale_factor if scaled else visual.xyz
    for cam in cams:
        r = render_particles_with_background(
            vxyz, visual.alive, attrs, bg,
            view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=cam.width, height=cam.height,
            bg_color=jnp.zeros(3 if bg is not None else attrs.color.shape[-1]),
            config=raster_cfg,
        )
        img = to_gray3(jnp.clip(r.color, 0, 1))
        if first_img is None:
            first_img = np.asarray(img)
        for name, target in (("", cam.image), ("_real", cam.image_real)):
            if target is None:
                continue
            tgt = target[..., None] if target.ndim == 2 else target
            gt = to_gray3(jnp.asarray(np.repeat(tgt, 3, -1) if tgt.shape[-1] == 1 else tgt
                                      ).transpose(2, 0, 1))
            out.setdefault(f"l1{name}", []).append(float(l1_loss(img, gt)))
            out.setdefault(f"psnr{name}", []).append(float(psnr(img, gt)))
    res = {k: float(np.mean(v)) for k, v in out.items()}
    return (res, first_img) if return_image else res


def main(argv=None):
    import sys

    resume = -1
    if argv is None:
        argv = sys.argv[1:]
    if "--resume_from_frame" in argv:
        i = argv.index("--resume_from_frame")
        resume = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    cfg = parse_cli(argv, description="train physical particles")
    if cfg.detect_anomaly:  # --detect_anomaly parity (helper_parser.py:24,46)
        jax.config.update("jax_debug_nans", True)
    if cfg.model.model_path:
        dump_config(cfg, os.path.join(cfg.model.model_path, "cfg_args.json"))
    writer = None
    if cfg.model.model_path:
        from fluidnexus_tpu.utils.tb import TrainLogger

        writer = TrainLogger(cfg.model.model_path)
    result = train(cfg, writer=writer, resume_from_frame=resume)
    print(f"done: {len(result['metrics'])} frames")


if __name__ == "__main__":
    main()
