"""Device A/B of the grid-reuse PBF tick: v2 per-projection kernels vs the
v3 grouped-IO kernels (in-kernel lambda/delta scaling, no per-iteration
layout copies) at the 28k bench workload.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pbf_tick_ab.py
"""
import numpy as np

from tools.bench_pbf_breakdown import timeit


def main():
    import jax
    import jax.numpy as jnp

    from fluidnexus_tpu.sim.pbf import PBFParams
    from fluidnexus_tpu.sim.pbf_dense import project_iterations_dense
    from fluidnexus_tpu.sim.state import make_particle_state

    rng = np.random.default_rng(0)
    params = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033,
                       dense_max_cells=2048, dense_cell_capacity=128)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    state = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)
    state = state._replace(counts=jnp.full_like(state.counts, 10.0))

    results = {}
    for backend in ("pallas_v2", "pallas"):
        step = jax.jit(
            lambda st: project_iterations_dense(st, params, 10,
                                                backend=backend)[0],
            static_argnames=())
        out = step(state)
        t = timeit(lambda: step(state).estimate_xyz.sum(), iters=4)
        results[backend] = (t, out)
        print(f"{backend:10s}  tick {t:7.1f} ms  ({1e3 / t:6.2f} ticks/s)")

    a, b = results["pallas_v2"][1], results["pallas"][1]
    de = float(jnp.abs(a.estimate_xyz - b.estimate_xyz).max())
    ref = float(jnp.abs(a.estimate_xyz).max())
    df = float(jnp.abs(a.force - b.force).max())
    rf = float(jnp.abs(a.force).max()) or 1.0
    print(f"estimate_xyz max |diff| {de:.3e} (max |ref| {ref:.3e})")
    print(f"force        max |diff| {df:.3e}  rel {df / rf:.3e}")


if __name__ == "__main__":
    main()
