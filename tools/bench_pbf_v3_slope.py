"""Per-iteration cost attribution for the v3 grid-reuse tick: times
_project_iterations_v3 at several iteration counts (the slope is the true
per-iteration cost incl. XLA glue) and the two v3 kernels stand-alone
(their difference from the slope = per-iteration glue: grouped<->cell
transposes, lambda pad concat, diagnostics).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pbf_v3_slope.py
"""
import numpy as np

from tools.bench_pbf_breakdown import timeit


def main():
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.ops.neighbors import build_dense_grid
    from fluidnexus_tpu.sim import pbf_pallas as pp
    from fluidnexus_tpu.sim.pbf import PBFParams
    from fluidnexus_tpu.sim.pbf_dense import _project_iterations_v3
    from fluidnexus_tpu.sim.state import make_particle_state

    rng = np.random.default_rng(0)
    params = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033,
                       dense_max_cells=2048, dense_cell_capacity=128)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    state = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)
    state = state._replace(counts=jnp.full_like(state.counts, 10.0))

    ts = {}
    for iters in (1, 4, 10):
        f = jax.jit(lambda st, it=iters: _project_iterations_v3(
            st, params, it)[0].estimate_xyz.sum())
        ts[iters] = timeit(lambda: f(state), iters=4)
        print(f"project_iterations_v3 x{iters:2d}  {ts[iters]:7.2f} ms")
    slope = (ts[10] - ts[1]) / 9.0
    print(f"per-iteration slope        {slope:7.3f} ms; "
          f"fixed (build+gathers+point) ~ {ts[1] - slope:.2f} ms")

    # stand-alone kernels at the same shapes
    h = float(params.h)
    eps = float(params.epsilon)
    c6 = float(params.poly6_term1)
    s45 = float(params.spiky_grad_term1)
    inv_p0 = 1.0 / float(params.p0)
    C, M = params.dense_max_cells, params.dense_cell_capacity
    grid = jax.jit(lambda x, a: build_dense_grid(x, h, a, C, M))(
        state.estimate_xyz, state.alive)
    mc = grid.bmask[:-1]
    mG = pp.cells_to_grouped(mc)
    cnt, _, sent = pp._planes(grid)
    xG = tuple(pp.cells_to_grouped(
        jnp.where(mc, grid.bxyz[:-1, :, k], sent[:-1])) for k in range(3))
    imG = jnp.ones_like(xG[0])
    planes3 = (cnt,) + tuple(
        jnp.concatenate([pp.grouped_to_cells(xG[k], C), sent[-1:]], 0)
        for k in range(3))

    p1 = jax.jit(lambda xg, pl3: pp.phase1_slots_v3(
        grid, h, eps, c6, s45, inv_p0, float(params.relaxation),
        xg[0], xg[1], xg[2], imG, pl3)[0].sum())
    print(f"phase1_v3 kernel           {timeit(lambda: p1(xG, planes3)):7.3f} ms")

    lamG = jnp.zeros_like(xG[0])
    lam_pad = jnp.zeros((C + 1, M), jnp.float32)
    ncG = jnp.full_like(xG[0], 30.0)
    p2 = jax.jit(lambda xg, lg, pl4: pp.phase2_slots_v3(
        grid, h, eps, c6, s45, float(params.k_p), float(params.e_p),
        float(1.0 / params.lamb_corr_denom), inv_p0,
        xg[0], xg[1], xg[2], lg, ncG, pl4)[0].sum())
    print(f"phase2_v3 kernel           "
          f"{timeit(lambda: p2(xG, lamG, planes3 + (lam_pad,))):7.3f} ms")

    # the glue alone: 4 grouped->cell transposes + sentinel concat
    glue = jax.jit(lambda xg, lg: sum(
        jnp.concatenate([pp.grouped_to_cells(g, C), sent[-1:]], 0).sum()
        for g in (xg[0], xg[1], xg[2], lg)))
    print(f"4x grouped->cells + concat {timeit(lambda: glue(xG, lamG)):7.3f} ms")


if __name__ == "__main__":
    main()
