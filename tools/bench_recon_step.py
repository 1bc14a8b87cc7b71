"""On-chip breakdown of one phase-C reconstruction fit step (the
recon_step_cameras_per_sec bench workload): 2-camera render fwd+bwd +
losses + adam at 28k particles, 960x544.

Times the full step, then ablations (image-only loss, raster-only grad,
no-vmap single camera), and optionally dumps an XLA trace for
tools/xplane_summary.py attribution.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_recon_step.py [--trace DIR]
"""
import argparse
import time

import numpy as np


def timeit(fn, iters=6):
    import jax
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.core.config import Config
    from fluidnexus_tpu.core.optim import adam_init
    from fluidnexus_tpu.data.cameras import Camera
    from fluidnexus_tpu.ops import RasterizerConfig
    from fluidnexus_tpu.pipelines.train_physical_particle import (
        _cam_tensors, make_current_frame_step, pbf_params_from_config)
    from fluidnexus_tpu.sim.state import make_particle_state, make_visual_state
    from fluidnexus_tpu.splat.dynamics import constant_visual_attrs

    rng = np.random.default_rng(0)
    width, height = 960, 544
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = RasterizerConfig(tile_x=32, tile_y=32, tile_capacity=384, chunk=32,
                           dup_x=3, dup_y=3, backend=backend)

    rcfg = Config()
    rcfg.optim.H = 2.0
    rcfg.optim.lambda_current_distance = 0.0
    rparams = pbf_params_from_config(rcfg)

    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    n_cam = 2
    rcams = []
    for i in range(n_cam):
        Ti = -R.T @ np.array([0.12 * i, 0.0, 3.0])
        rcams.append(Camera(uid=i, R=R, T=Ti, fovx=0.9, fovy=0.6,
                            width=width, height=height))
    rviews, rprojs, rfovs = _cam_tensors(rcams)
    rgts = jnp.zeros((n_cam, 3, height, width), jnp.float32)

    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    rstate = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)
    rvisual = make_visual_state(32768, jnp.asarray(px[:28000], jnp.float32))
    rattrs = constant_visual_attrs(32768, channels=1)
    stepC = make_current_frame_step(None, cfg, width, height, rparams,
                                    rcfg.optim, 3, mesh=None)
    nn0 = rstate.estimate_xyz / rparams.scale_factor
    wv = jnp.ones(n_cam, jnp.float32)
    iw = jnp.float32(1.0 / n_cam)
    lr0 = jnp.float32(1e-4)

    opt0 = adam_init({"nn": nn0})

    def full():
        # production-faithful: chain (nn, opt) across the 8 steps like the
        # phase-C fit loop does (re-initializing adam per call measures the
        # init transfers, not the step; bench.py chains the same way)
        nn, opt = nn0, opt0
        for _ in range(8):
            nn, opt, loss, aux = stepC(nn, opt, rstate, rvisual, rattrs,
                                       (rviews, rprojs, rfovs), rgts,
                                       lr0, wv, iw)
        return nn
    t_full = timeit(full, iters=1) / 8.0
    print(f"full step (2 cams)         {t_full:8.2f} ms   "
          f"({2e3 / t_full:.2f} cameras/s)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = full()
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
