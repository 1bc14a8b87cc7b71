"""Compiled-Mosaic check for the dense PBF pallas kernels on the real chip.

1. pallas-vs-XLA equivalence of one projection at a mid-size shape
   (the CPU suite only runs the kernels in interpreter mode).
2. Bench-workload tick timing (28k particles, 10 Jacobi projections) for
   both backends — records the solver throughput the bench metric tracks.

Standalone: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_pbf_check.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.sim.pbf import PBFParams
from fluidnexus_tpu.sim.pbf_dense import project_gas_constraints_dense
from fluidnexus_tpu.sim.state import make_particle_state
from fluidnexus_tpu.pipelines.train_physical_particle import solver_tick


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # --- equivalence at a mid-size shape ---
    params = PBFParams(h=1.0, dense_max_cells=512, dense_cell_capacity=64)
    pts = rng.uniform(-3, 3, (3000, 3)).astype(np.float32) + np.float32(40.0)
    st = make_particle_state(4096, jnp.asarray(pts), init_velocity_y=10.0)
    st = st._replace(counts=jnp.full((4096,), 3.0),
                     velocity=jnp.asarray(
                         rng.standard_normal((4096, 3)).astype(np.float32)))
    a, ad = jax.jit(lambda s: project_gas_constraints_dense(s, params, backend="xla"))(st)
    b, bd = jax.jit(lambda s: project_gas_constraints_dense(s, params, backend="pallas"))(st)
    err = float(jnp.max(jnp.abs(a.estimate_xyz - b.estimate_xyz)))
    rel = err / max(float(jnp.max(jnp.abs(a.estimate_xyz - st.estimate_xyz))), 1e-9)
    print(f"estimate_xyz max abs diff {err:.3e} (vs max delta rel {rel:.3e})")
    assert err < 5e-4, err
    for k in ad:
        da, db = float(ad[k]), float(bd[k])
        assert abs(da - db) <= 1e-3 * max(1.0, abs(da)), (k, da, db)
    print("pallas == xla (compiled): OK")

    # --- bench-workload tick timing ---
    bp = PBFParams(h=2.0, p0=1.5, k=3.0, secs=0.033,
                   dense_max_cells=2048, dense_cell_capacity=128)
    px = rng.uniform(-8, 8, (28000, 3)).astype(np.float32) + np.array(
        [32.6, 10, -30], np.float32)
    pstate = make_particle_state(32768, jnp.asarray(px), init_velocity_y=50.0)

    for backend in ("pallas", "xla"):
        @jax.jit
        def tick(s):
            from fluidnexus_tpu.sim.pbf import guess_hidden
            s = guess_hidden(s, bp, stable=False, use_wind=False)
            s = s._replace(counts=jnp.full_like(s.counts, 10.0))

            def body(x, _):
                x, d = project_gas_constraints_dense(x, bp, backend=backend)
                return x, ()

            s, _ = jax.lax.scan(body, s, None, length=10)
            return s, jnp.sum(s.xyz)

        s0, chk = tick(pstate)
        float(chk)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            s, chk = tick(pstate)
            for _ in range(4):
                s, chk = tick(s)
            float(chk)
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"{backend}: {best * 1e3:.1f} ms/tick = {1 / best:.2f} ticks/s")


if __name__ == "__main__":
    main()
