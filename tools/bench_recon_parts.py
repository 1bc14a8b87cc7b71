"""Stage-level on-chip timing of the recon fit step's non-raster terms:
dense-grid build, sentinel planes, density fwd/VJP, splat advection VJP,
SSIM fwd+bwd — at the recon_step_cameras_per_sec bench shapes (28k alive /
32768 cap, density grid 4096x32).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_recon_parts.py
"""
import time

import numpy as np


def timeit(fn, *args, iters=8):
    s = fn(*args)
    float(np.asarray(s).ravel()[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*args)
        float(np.asarray(s).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import os

    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from fluidnexus_tpu.core.config import Config
    from fluidnexus_tpu.ops.neighbors import build_dense_grid
    from fluidnexus_tpu.pipelines.train_physical_particle import (
        pbf_params_from_config)
    from fluidnexus_tpu.sim.pbf import (density_ratio_at, guess_from_nn,
                                        visual_xyz_from_nn)
    from fluidnexus_tpu.sim.pbf_pallas import _planes
    from fluidnexus_tpu.sim.state import make_particle_state, make_visual_state
    from fluidnexus_tpu.utils.losses import ssim

    rng = np.random.default_rng(0)
    rcfg = Config()
    rcfg.optim.H = 2.0
    params = pbf_params_from_config(rcfg)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    state = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)
    visual = make_visual_state(32768, jnp.asarray(px[:28000], jnp.float32))
    nn = state.estimate_xyz / params.scale_factor
    pos = nn * params.scale_factor
    C, M = params.dense_max_cells, params.dense_cell_capacity
    print(f"density grid C={C} M={M}")

    build = jax.jit(lambda x, a: build_dense_grid(x, float(params.h), a, C, M))
    g0 = build(pos, state.alive)
    t = timeit(lambda: build(pos, state.alive).bxyz.sum())
    print(f"build_dense_grid            {t:7.2f} ms")

    planes_fn = jax.jit(lambda x, a: _planes(build_dense_grid(
        x, float(params.h), a, C, M))[1].sum())
    t = timeit(lambda: planes_fn(pos, state.alive))
    print(f"build + sentinel planes     {t:7.2f} ms")

    dens = jax.jit(lambda p, a, im: density_ratio_at(p, a, im, params).sum())
    t = timeit(lambda: dens(pos, state.alive, state.imass))
    print(f"density_ratio_at fwd        {t:7.2f} ms")

    dgrad = jax.jit(jax.grad(
        lambda p: (density_ratio_at(p, state.alive, state.imass, params)
                   ** 2).sum()))
    t = timeit(lambda: dgrad(pos).sum())
    print(f"density_ratio_at fwd+bwd    {t:7.2f} ms")

    both = jax.jit(jax.grad(lambda nnq: (
        (density_ratio_at(nnq * params.scale_factor, state.alive, state.imass,
                          params) - 1.0) ** 2
        + (density_ratio_at(guess_from_nn(nnq, state, params), state.alive,
                            state.imass, params) - 1.0) ** 2).sum()))
    t = timeit(lambda: both(nn).sum())
    print(f"gas + next_gas fwd+bwd      {t:7.2f} ms")

    adv = jax.jit(jax.grad(lambda nnq: visual_xyz_from_nn(
        visual.xyz, visual.alive, nnq, state, params).sum()))
    t = timeit(lambda: adv(nn).sum())
    print(f"visual_xyz_from_nn fwd+bwd  {t:7.2f} ms")

    img = jnp.asarray(rng.uniform(0, 1, (3, 544, 960)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, 544, 960)), jnp.float32)
    sg = jax.jit(jax.grad(lambda a: 1.0 - ssim(a, gt)))
    t = timeit(lambda: sg(img).sum())
    print(f"ssim 3ch fwd+bwd            {t:7.2f} ms")

    img1, gt1 = img[:1], gt[:1]
    sg1 = jax.jit(jax.grad(lambda a: 1.0 - ssim(a, gt1)))
    t = timeit(lambda: sg1(img1).sum())
    print(f"ssim 1ch fwd+bwd            {t:7.2f} ms")


if __name__ == "__main__":
    main()
