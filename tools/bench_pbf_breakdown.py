"""On-chip breakdown of one PBF projection at the 28k bench workload.

Times each stage with device-reduced-scalar fencing (see
tools/bench_attention.timeit — raw block_until_ready can return
pre-execution through the axon relay). Run standalone:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pbf_breakdown.py
"""
import time

import numpy as np


def timeit(fn, *args, iters=8):
    import jax  # noqa: F401

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
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.ops.neighbors import build_dense_grid
    from fluidnexus_tpu.sim.pbf import PBFParams
    from fluidnexus_tpu.sim.pbf_dense import project_gas_constraints_dense
    from fluidnexus_tpu.sim import pbf_pallas
    from fluidnexus_tpu.sim.state import make_particle_state
    from fluidnexus_tpu.pipelines.train_physical_particle import solver_tick

    rng = np.random.default_rng(0)
    params = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033,
                       dense_max_cells=2048, dense_cell_capacity=128)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    state = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)

    C, M = params.dense_max_cells, params.dense_cell_capacity
    h = float(params.h)

    build = jax.jit(lambda x, a: build_dense_grid(x, h, a, C, M))
    grid = build(state.estimate_xyz, state.alive)
    t_build = timeit(lambda: build(state.estimate_xyz, state.alive).bxyz.sum())
    print(f"build_dense_grid      {t_build:7.2f} ms")

    gath = jax.jit(lambda g: pbf_pallas._planes(g))
    t_gath = timeit(lambda: gath(grid)[1].sum())
    print(f"_planes               {t_gath:7.2f} ms")

    planes = gath(grid)

    def p1(g, gd):
        out = pbf_pallas.phase1_slots_v2(
            g, h, float(params.epsilon), float(params.poly6_term1),
            float(params.spiky_grad_term1), planes=tuple(gd))
        return out[0].sum() + out[1].sum()

    p1j = jax.jit(p1)
    t_p1 = timeit(lambda: p1j(grid, planes))
    print(f"phase1_slots_v2       {t_p1:7.2f} ms")

    lam_s = jnp.zeros((C, M), jnp.float32)

    def p2(g, ls, gd):
        out = pbf_pallas.phase2_slots_v2(
            g, ls, h, float(params.epsilon), float(params.poly6_term1),
            float(params.spiky_grad_term1), float(params.k_p),
            float(params.e_p), float(1.0 / params.lamb_corr_denom),
            planes=tuple(gd))
        return out[0].sum()

    p2j = jax.jit(p2)
    t_p2 = timeit(lambda: p2j(grid, lam_s, planes))
    print(f"phase2_slots_v2       {t_p2:7.2f} ms")

    proj = jax.jit(lambda st: project_gas_constraints_dense(st, params)[0].estimate_xyz.sum())
    t_proj = timeit(lambda: proj(state))
    # NOTE: "residual, approx" — inside the fused projection jit the stages
    # overlap and fuse differently than when fenced one by one, so this
    # subtraction is indicative only (it can go negative); use an XLA trace
    # (tools/xplane_summary.py) for real attribution
    print(f"full projection       {t_proj:7.2f} ms   "
          f"(residual, approx = {t_proj - t_build - t_gath - t_p1 - t_p2:.2f})")

    @jax.jit
    def tick(st):
        st2, _ = solver_tick(st, params, 10, use_wind=False)
        # fence on BOTH updated fields — reducing only xyz lets XLA dead-code
        # the projections when a stage doesn't feed it
        return st2.xyz.sum() + st2.estimate_xyz.sum() + st2.velocity.sum()

    t_tick = timeit(lambda: tick(state), iters=3)
    print(f"full tick (10 proj)   {t_tick:7.2f} ms   ({1e3 / t_tick:.3f} ticks/s)")


if __name__ == "__main__":
    main()
