"""Full-scale on-chip reconstruction run at the reference workload shape.

Generates a synthetic ground-truth plume (the real PBF solver run from a
jittered init, rendered to 960x544 from 5 training + 1 held-out camera per
frame), then runs the COMPLETE train_physical_particle pipeline on it with
the reference iteration counts (configs/fluid_nexus_smoke_dynamics.json:
120 frames, 1000 opt iters/frame, 10 Jacobi projections/tick, hidden cap
32768 / ~28k alive, batch 1) and writes RUN_R5.md with per-phase wall-clock,
per-frame loss/PSNR, and capacity-overflow accounting.

This is the multi-hour end-to-end evidence per-step benches cannot give:
compile stability across 120 frame fits, emitter/capacity behavior over a
full plume, loss health, wall-clock per frame.

Usage (full scale, ~2-4h on one v5e chip):
    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/run_full_scale_recon.py \
        --out runs/full_scale_r5

Script smoke test (tiny, CPU): --frames 3 --iters 5 --width 96 --height 56 --cpu
"""
import argparse
import json
import os
import time


def build_cameras(width, height, n_train=5, n_test=1):
    """Camera ring around the plume column (init_x_mid 0.326, z_mid -0.3),
    matching the reference's 5-view capture geometry (train_views "20134")."""
    import numpy as np

    from fluidnexus_tpu.data.cameras import Camera

    center = np.array([0.326, 0.35, -0.3])
    cams = []
    angles = np.linspace(-0.65, 0.65, n_train)
    test_angles = [0.25] if n_test else []
    for kind, angs in (("train", angles), ("test", test_angles)):
        for i, ang in enumerate(angs):
            ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                           [-np.sin(ang), 0, np.cos(ang)]])
            R = ry @ np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
            pos = center + ry @ np.array([0.0, 0.0, 2.2])
            T = -R.T @ pos
            cams.append((kind, i, dict(R=R, T=T, fovx=0.9, fovy=0.6,
                                       width=width, height=height)))
    return cams, Camera


def simulate_gt(cfg, frames, cam_specs, Camera, log):
    """Run the true plume: jittered lattice init + the real solver, render
    every frame from every camera. Returns SceneInfo-ready camera lists."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidnexus_tpu.data.readers import SceneInfo
    from fluidnexus_tpu.ops import RasterizerConfig
    from fluidnexus_tpu.pipelines.train_physical_particle import (
        pbf_params_from_config, solver_tick)
    from fluidnexus_tpu.sim.pbf import confirm_guess, remove_invalid
    from fluidnexus_tpu.sim.state import make_particle_state
    from fluidnexus_tpu.splat.dynamics import (constant_visual_attrs,
                                               create_hidden_points)
    from fluidnexus_tpu.splat.render import (render_particles_with_background,
                                             to_gray3)

    o, m = cfg.optim, cfg.model
    params = pbf_params_from_config(cfg)
    gt_rng = np.random.default_rng(12345)

    pts = create_hidden_points(m)
    # jitter so the recon's own lattice init cannot trivially match
    pts = pts + gt_rng.uniform(-0.4, 0.4, pts.shape).astype(np.float32) * \
        m.init_hidden_delta * 100.0
    log(f"GT hidden init: {pts.shape[0]} particles")
    state = make_particle_state(m.hidden_capacity, jnp.asarray(pts),
                                init_velocity_y=o.init_hidden_velocity,
                                gravity_alpha_buoyancy=np.array([0, -9.8, 0]) * o.alpha)

    rcfg = RasterizerConfig(tile_capacity=cfg.pipe.tile_capacity,
                            tile_x=cfg.pipe.tile_x, tile_y=cfg.pipe.tile_y,
                            dup_x=cfg.pipe.dup_x, dup_y=cfg.pipe.dup_y,
                            chunk=cfg.pipe.chunk, backend=cfg.pipe.backend)
    attrs = constant_visual_attrs(m.hidden_capacity, channels=1)

    @jax.jit
    def render_one(xyz, alive, view, proj, fovx, fovy):
        out = render_particles_with_background(
            xyz / params.scale_factor, alive, attrs, None,
            view_matrix=view, proj_matrix=proj, tan_fovx=fovx, tan_fovy=fovy,
            width=cam_specs[0][2]["width"], height=cam_specs[0][2]["height"],
            bg_color=jnp.zeros(1), config=rcfg)
        return jnp.clip(to_gray3(out.color), 0.0, 1.0)

    for _ in range(o.stable_iterations):
        state = remove_invalid(state, params)
        state, _ = solver_tick(state, params, o.solver_iterations,
                               use_wind=False, stable=True)
        state = confirm_guess(state, params)

    cam_objs = []  # Camera objects per (kind, frame)
    t0 = time.time()
    train_cams, test_cams = [], []
    uid = 0
    for t in range(frames):
        if t > 0:
            state = remove_invalid(state, params)
            state, _ = solver_tick(state, params, o.solver_iterations,
                                   use_wind=False)
            state = confirm_guess(state, params)
        for kind, i, spec in cam_specs:
            view = jnp.asarray(Camera(uid=0, **spec).world_view)
            proj = jnp.asarray(Camera(uid=0, **spec).full_proj)
            img = np.asarray(render_one(state.estimate_xyz, state.alive, view, proj,
                                        Camera(uid=0, **spec).tan_fovx,
                                        Camera(uid=0, **spec).tan_fovy))
            img = img.transpose(1, 2, 0).astype(np.float32)  # (H,W,3)
            cam = Camera(uid=uid, image=img, image_real=img,
                         image_name=f"{kind}0{i}", time_idx=t, **spec)
            uid += 1
            (train_cams if kind == "train" else test_cams).append(cam)
        if t % 20 == 0:
            log(f"GT frame {t}/{frames}: alive={int(state.num_alive)} "
                f"({time.time()-t0:.0f}s)")
    log(f"GT simulation+render done in {time.time()-t0:.1f}s "
        f"(final alive={int(state.num_alive)})")
    return SceneInfo(point_cloud=None, train_cameras=train_cams,
                     test_cameras=test_cams,
                     nerf_normalization={"radius": 2.2,
                                         "translate": np.zeros(3)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/full_scale_r5")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--first_iters", type=int, default=1000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stable_iters", type=int, default=20)
    ap.add_argument("--hidden_delta", type=float, default=0.01,
                    help="lattice spacing; 0.01 -> ~28k particles")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from fluidnexus_tpu.core.config import Config
    from fluidnexus_tpu.utils.tb import TrainLogger

    os.makedirs(args.out, exist_ok=True)
    logf = open(os.path.join(args.out, "run.log"), "a", buffering=1)
    overflow = {"count": 0}

    def log(*a):
        line = " ".join(str(x) for x in a)
        if "capacity" in line.lower() and "overflow" in line.lower():
            overflow["count"] += 1
        stamp = time.strftime("%H:%M:%S")
        print(f"[{stamp}] {line}", flush=True)
        logf.write(f"[{stamp}] {line}\n")

    # reference fluid_nexus_smoke_dynamics.json operating point
    cfg = Config()
    o, m = cfg.optim, cfg.model
    m.model_path = os.path.join(args.out, "recon")
    m.hidden_capacity = 32768
    m.visual_capacity = 65536
    o.iterations_per_time_first = args.first_iters
    o.iterations_per_time_current = args.iters
    o.iterations_per_time_current_max = args.iters
    o.stable_iterations = args.stable_iters
    o.solver_iterations = 10
    o.secs = 0.033
    o.alpha = 0.0
    o.p0 = 1.5
    o.k = 3.0
    o.H = 2.0
    o.init_hidden_velocity = 100.0
    o.emit_ratio_hidden = 0.0      # smoke config: no hidden emission
    o.emit_ratio_visual = 1.0
    o.batch = 1
    o.lambda_dssim = 0.2
    o.lambda_exyz = 0.1
    o.lambda_gas_constraints = 1.0
    o.lambda_next_gas_constraints = 0.1
    o.lambda_first_distance = 1.0
    o.lambda_current_distance = 0.1
    m.init_hidden_radius_max = 0.1
    m.init_hidden_y_min = -0.1
    m.init_hidden_y_max = 0.8
    m.init_hidden_delta = args.hidden_delta
    m.init_visual_num_pts = 500
    m.init_thick_visual_num_pts = 550
    cfg.pipe.tile_x = 32
    cfg.pipe.tile_y = 32
    cfg.pipe.tile_capacity = 384
    cfg.pipe.chunk = 32
    cfg.pipe.dup_x = 3
    cfg.pipe.dup_y = 3

    cam_specs, Camera = build_cameras(args.width, args.height)
    log(f"=== GT simulation ({args.frames} frames, {args.width}x{args.height}, "
        f"{len(cam_specs)} cams) ===")
    t_gt = time.time()
    scene = simulate_gt(cfg, args.frames, cam_specs, Camera, log)
    t_gt = time.time() - t_gt

    log(f"=== reconstruction (iters/frame={args.iters}) ===")
    from fluidnexus_tpu.pipelines.train_physical_particle import train

    writer = TrainLogger(args.out)
    t_fit = time.time()
    result = train(cfg, scene_info=scene, writer=writer, log=log)
    t_fit = time.time() - t_fit

    metrics = result["metrics"]
    import numpy as np
    np.save(os.path.join(args.out, "metrics.npy"), np.asarray(metrics, dtype=object),
            allow_pickle=True)

    psnrs = [m_["psnr"] for m_ in metrics if "psnr" in m_]
    losses = [m_["loss"] for m_ in metrics]
    lines = [
        "# RUN_R5 — full-scale on-chip reconstruction",
        "",
        f"- workload: {args.frames} frames x {args.iters} opt iters/frame, "
        f"{args.width}x{args.height}, 5 train + 1 held-out cam, hidden cap "
        f"{m.hidden_capacity}, 10 Jacobi projections/tick, batch 1 "
        f"(reference operating point: configs/fluid_nexus_smoke_dynamics.json)",
        f"- device: {jax.devices()}",
        f"- GT sim+render wall-clock: {t_gt:.1f}s",
        f"- reconstruction wall-clock: {t_fit:.1f}s "
        f"({t_fit/max(len(metrics),1):.1f}s/frame avg incl. compile)",
        f"- capacity-overflow warnings: {overflow['count']}",
        f"- frames completed: {len(metrics)}/{args.frames - 1}",
        f"- loss: first {losses[0]:.5f} -> last {losses[-1]:.5f} "
        f"(median {np.median(losses):.5f})" if losses else "- no frames",
        (f"- held-out PSNR: first {psnrs[0]:.2f} dB -> last {psnrs[-1]:.2f} dB "
         f"(median {np.median(psnrs):.2f}, min {min(psnrs):.2f})"
         if psnrs else "- no held-out PSNR"),
        "",
        "Per-frame metrics: metrics.npy; tensorboard: events files under this "
        "directory; per-frame npy checkpoints: recon/checkpoint/.",
    ]
    with open("RUN_R5.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    log("\n".join(lines))


if __name__ == "__main__":
    main()
