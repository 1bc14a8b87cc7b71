import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.sim.pbf import (
    PBFParams, confirm_guess, guess_hidden, poly6, project_gas_constraints,
    remove_invalid, solver_loop, spiky_grad, update_visual,
)
from fluidnexus_tpu.sim.state import (
    ParticleState, emit_into_dead_slots, make_particle_state, make_visual_state,
)
from tests.ref_pbf import project_step_ref


def blob_state(n=80, cap=128, seed=0, spread=0.5):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    st = make_particle_state(cap, jnp.asarray(xyz), init_velocity_y=1.0)
    st = st._replace(estimate_xyz=st.xyz)
    return st, xyz


def test_kernels_match_closed_form():
    p = PBFParams(h=0.625)
    r2 = np.array([0.0, 0.1, 0.39, 0.5], np.float32)
    expect = np.where(r2 < p.h2, 315.0 / (64 * np.pi * p.h**9) * (p.h2 - r2) ** 3, 0.0)
    np.testing.assert_allclose(np.asarray(poly6(p, jnp.asarray(r2))), expect, rtol=1e-5)

    r = np.array([[0.1, 0.2, 0.0], [0.0, 0.0, 0.7]], np.float32)
    rlen = np.linalg.norm(r, axis=1).astype(np.float32)
    got = np.asarray(spiky_grad(p, jnp.asarray(r), jnp.asarray(rlen)))
    g0 = -(r[0] / (rlen[0] + 1e-8)) * 45.0 / (np.pi * p.h**6) * (p.h - rlen[0]) ** 2
    np.testing.assert_allclose(got[0], g0, rtol=1e-5)
    np.testing.assert_allclose(got[1], 0.0)  # outside support


def test_projection_matches_edge_list_oracle():
    st, xyz = blob_state(n=40, cap=64, spread=0.4)
    p = PBFParams(h=0.625, knn_k=64)
    vel = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    st = st._replace(velocity=jnp.asarray(vel))
    new_st, diag = project_gas_constraints(st, p)
    assert int(diag["overflow"]) == 0

    ref_est, ref_force, ref_extra = project_step_ref(
        xyz.astype(np.float64), vel[:40].astype(np.float64),
        np.zeros((40, 3)), np.ones(40), np.zeros(40), h=0.625,
    )
    np.testing.assert_allclose(np.asarray(new_st.estimate_xyz)[:40], ref_est, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_st.force)[:40], ref_force, rtol=2e-4, atol=2e-5)
    # dead rows untouched
    assert np.all(np.asarray(new_st.estimate_xyz)[40:] == 0)


@pytest.mark.slow
def test_density_converges_toward_rest():
    """Solver iterations must reduce the density-constraint violation."""
    st, _ = blob_state(n=100, cap=128, spread=0.25, seed=2)
    p = PBFParams(h=0.625, p0=1.5, knn_k=96)
    _, diag0 = project_gas_constraints(st, p)
    final, diags = solver_loop(st, p, iterations=10)
    v0 = abs(float(diag0["p_ratio"]) - 1.0)
    v1 = abs(float(diags["p_ratio"][-1]) - 1.0)
    assert v1 < v0, (v0, v1)


def test_guess_and_confirm_roundtrip():
    st, xyz = blob_state(n=10, cap=16)
    p = PBFParams(secs=0.033, alpha=-0.2)
    g = guess_hidden(st, p)
    # v' = v + g*alpha*dt (force 0); estimate = xyz + dt*v'
    expected_v = np.array([0.0, 1.0 + (-9.8) * (-0.2) * 0.033, 0.0])
    np.testing.assert_allclose(np.asarray(g.velocity)[:10], np.tile(expected_v, (10, 1)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g.estimate_xyz)[:10], xyz + 0.033 * expected_v, rtol=1e-5, atol=1e-6
    )
    c = confirm_guess(g, p)
    np.testing.assert_allclose(np.asarray(c.xyz)[:10], np.asarray(g.estimate_xyz)[:10])
    np.testing.assert_allclose(np.asarray(c.velocity)[:10], np.tile(expected_v, (10, 1)), rtol=1e-4)


def test_guess_stable_uses_stabilization_constants():
    st, xyz = blob_state(n=5, cap=8)
    p = PBFParams(secs=0.033, alpha=-0.2)
    g = guess_hidden(st, p, stable=True)
    expected_v = 1.0 + (-9.8) * (-1.0) * 0.01
    np.testing.assert_allclose(np.asarray(g.velocity)[:5, 1], expected_v, rtol=1e-5)


def test_wind_force():
    st, xyz = blob_state(n=6, cap=8)
    st = st._replace(xyz=st.xyz.at[:, 1].set(50.0))  # y = 0.5 world
    p = PBFParams(secs=0.033, alpha=0.0, wind_force=(2.0, 0.0, 0.0), wind_power=1.0)
    g = guess_hidden(st, p, use_wind=True)
    # wind = clip(y_world^1 * 2, 0, 2) = 1.0; dv = 1.0*0.033
    np.testing.assert_allclose(np.asarray(g.velocity)[:6, 0], 0.5 * 2.0 * 0.033, rtol=1e-5)


def test_remove_invalid_kills_isolated():
    xyz = np.zeros((5, 3), np.float32)
    xyz[:4] = np.random.default_rng(0).uniform(0, 0.2, (4, 3))
    xyz[4] = [10.0, 10.0, 10.0]  # isolated
    st = make_particle_state(8, jnp.asarray(xyz))
    p = PBFParams(h=0.625, min_neighbors=2, knn_k=8)
    out = remove_invalid(st, p)
    alive = np.asarray(out.alive)
    assert alive[:4].all() and not alive[4]


def test_emit_into_dead_slots():
    st = make_particle_state(8, jnp.asarray(np.ones((3, 3), np.float32)))
    new = jnp.asarray(np.full((4, 3), 2.0, np.float32))
    mask = jnp.asarray([True, False, True, True])
    out, dropped = emit_into_dead_slots(st, new, mask)
    assert int(dropped) == 0
    assert int(out.alive.sum()) == 6
    got = np.asarray(out.xyz)[np.asarray(out.alive)]
    assert (got == 2.0).sum() == 9  # 3 new particles x 3 coords


def test_emit_overflow_drops():
    st = make_particle_state(4, jnp.asarray(np.ones((3, 3), np.float32)))
    new = jnp.asarray(np.full((3, 3), 2.0, np.float32))
    out, dropped = emit_into_dead_slots(st, new, jnp.asarray([True, True, True]))
    assert int(dropped) == 2
    assert int(out.alive.sum()) == 4


def test_update_visual_advects_with_flow():
    rng = np.random.default_rng(3)
    hidden_xyz = rng.uniform(-0.2, 0.2, (50, 3)).astype(np.float32)
    st = make_particle_state(64, jnp.asarray(hidden_xyz))
    st = st._replace(
        estimate_xyz=st.xyz,
        velocity=jnp.where(st.alive[:, None], jnp.asarray([[1.0, 0.0, 0.0]]), 0.0),
    )
    vis = make_visual_state(16, jnp.asarray(np.zeros((8, 3), np.float32)))
    p = PBFParams(h=0.625, secs=0.033, knn_k=64)
    out = update_visual(vis, st, p)
    moved = np.asarray(out.xyz)[:8] - 0.0
    assert np.all(moved[:, 0] > 0.02)  # moved along +x by ~v*dt
    np.testing.assert_allclose(moved[:, 1:], 0.0, atol=1e-5)
    assert np.all(np.asarray(out.xyz)[8:] == 0)
