"""Position-Based Fluids solver — pure, jittable functions.

Behavioral parity with the reference solver embedded in GaussianModel
(gm_dynamics.py): setup_constants:83-186, poly6/spiky_grad:188-200,
guess_hidden_particles:978-1032, project_gas_constraints:1076-1184,
confirm_guess_hidden_particles:1323-1338, update_visual_particles:1360-1402,
remove_invalid_particles:1033-1060.

TPU-first redesign: instead of COO edge lists + index_add (GPU scatter), all
reductions run over PADDED dense neighbor lists (N, K) from
fluidnexus_tpu.ops.neighbors — masked sums the VPU eats directly, and the
whole solver loop is a lax.scan. Positions live in "scaled space"
(world * scale_factor, scale_factor = 100).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.ops.neighbors import NeighborList, radius_graph, radius_query
from fluidnexus_tpu.sim.state import ParticleState, VisualState

GRAVITY = np.array([0.0, -9.8, 0.0], np.float32)


@dataclasses.dataclass(frozen=True)
class PBFParams:
    """Solver constants (ref setup_constants, gm_dynamics.py:83-186)."""

    secs: float = 0.033
    alpha: float = -0.2                  # gravity scaling for gases (buoyancy)
    beta: float = 0.0
    buoyancy_decay_rate: float = 0.0
    buoyancy_max_y: float = 0.0          # world units; >0 enables height-scaled buoyancy
    h: float = 0.625                     # SPH kernel radius (scaled space)
    p0: float = 1.5                      # rest density
    k: float = 3.0                       # drag coefficient
    min_neighbors: int = -1
    knn_k: int = 100                     # max neighbors (ref KNN_K)
    init_hidden_velocity: float = 0.0
    wind_force: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    wind_power: float = 1.0
    scale_factor: float = 100.0
    epsilon: float = 1e-8
    relaxation: float = 0.01             # ref RELAXATION
    k_p: float = 0.2                     # ref K_P (s_corr strength)
    e_p: float = 4.0                     # ref E_P (s_corr exponent)
    dq_p: float = 0.25                   # ref DQ_P (s_corr ref distance)
    cell_capacity: int = 32
    table_size: Optional[int] = None
    # dense cell-pair solver path (sim/pbf_dense.py): static caps for the
    # compacted grid — compacted occupied cells and points per cell. Size for
    # the workload (overflow is counted in diagnostics): defaults fit a
    # reference-scale plume at h=0.625; the 28k/h=2.0 bench passes
    # (2048, 128).
    dense_max_cells: int = 4096
    dense_cell_capacity: int = 32

    @property
    def h2(self):
        return self.h * self.h

    @property
    def poly6_term1(self):
        return 315.0 / (64.0 * np.pi * self.h**9)

    @property
    def spiky_grad_term1(self):
        return 45.0 / (np.pi * self.h**6)

    @property
    def lamb_corr_denom(self):
        # poly6 at r2 = (DQ_P * H)^2 (ref gm_dynamics.py:134)
        r2 = (self.dq_p * self.dq_p * self.h * self.h)
        return self.poly6_term1 * (self.h2 - r2) ** 3


def poly6(params: PBFParams, r2):
    """Poly6 density kernel; 0 outside support (gm_dynamics.py:188-191)."""
    term2 = params.h2 - r2
    return jnp.where(r2 < params.h2, params.poly6_term1 * term2**3, 0.0)


def spiky_grad(params: PBFParams, r, rlen):
    """Spiky kernel gradient; 0 at r=0 and outside support (:193-200)."""
    mask = (rlen < params.h) & (rlen > 0)
    r_norm = r / (rlen[..., None] + params.epsilon)
    grad = -r_norm * params.spiky_grad_term1 * (params.h - rlen)[..., None] ** 2
    return jnp.where(mask[..., None], grad, 0.0)


def guess_hidden(state: ParticleState, params: PBFParams, stable: bool = False,
                 use_wind: bool = False) -> ParticleState:
    """Semi-implicit Euler prediction step (guess_hidden_particles, :978-1032).

    stable=True uses the stabilization constants (secs=0.01, alpha=-1.0).
    Buoyancy is recomputed fresh each call, optionally scaled down with
    height, and the *stored* buoyancy is decayed for use by the NN-guess
    losses between ticks.
    """
    cur_secs = 0.01 if stable else params.secs
    cur_alpha = -1.0 if stable else params.alpha
    g = jnp.asarray(GRAVITY)
    buoy = jnp.broadcast_to(g * cur_alpha, state.xyz.shape)

    if params.buoyancy_max_y > 0.0:
        scale_max_y = params.buoyancy_max_y * params.scale_factor
        coeff = 1.0 - state.xyz[:, 1:2] / scale_max_y
        cur_buoy = buoy * coeff
    else:
        cur_buoy = buoy

    vel = state.velocity + cur_buoy * cur_secs + cur_secs * state.force
    if use_wind:
        y_world = state.xyz[:, 1:2] / params.scale_factor
        wf = jnp.asarray(params.wind_force, jnp.float32)
        wind = jnp.clip((y_world ** params.wind_power) * wf, 0.0, max(params.wind_force))
        vel = vel + wind * cur_secs

    stored_buoy = buoy * params.buoyancy_decay_rate if params.buoyancy_decay_rate > 0.0 else buoy
    m = state.alive[:, None]
    return state._replace(
        velocity=jnp.where(m, vel, 0.0),
        buoyancy=stored_buoy,
        force=jnp.zeros_like(state.force),
        estimate_xyz=jnp.where(m, state.xyz + cur_secs * vel, state.estimate_xyz),
        counts=jnp.zeros_like(state.counts),
    )


def _density_terms(params: PBFParams, pos, nl: NeighborList, self_idx):
    """Shared per-edge quantities over a padded neighbor list."""
    npos = pos[nl.idx]                                    # (N,K,3)
    diff = pos[:, None, :] - npos                         # (N,K,3)
    dist2 = jnp.sum(diff * diff, -1)                      # (N,K)
    p6 = jnp.where(nl.mask, poly6(params, dist2), 0.0)
    is_self = nl.idx == self_idx[:, None]
    mask_ns = nl.mask & ~is_self
    return diff, dist2, p6, mask_ns


def project_gas_constraints(state: ParticleState, params: PBFParams,
                            nl: Optional[NeighborList] = None):
    """One PBF density-constraint Jacobi iteration + drag force
    (project_gas_constraints, gm_dynamics.py:1076-1184). Returns
    (state, diagnostics) where diagnostics match the reference's logged
    scalar means (over alive particles / valid edges)."""
    exyz = state.estimate_xyz
    if nl is None:
        nl = radius_graph(exyz, params.h, k=params.knn_k, loop=True, alive=state.alive,
                          table_size=params.table_size, cell_capacity=params.cell_capacity)
    self_idx = jnp.arange(state.capacity, dtype=jnp.int32)
    diff, dist2, p6, mask_ns = _density_terms(params, exyz, nl, self_idx)

    pi = jnp.sum(p6, -1) / state.imass                       # (N,) density
    neighbors_len = nl.mask.sum(-1).astype(jnp.float32)      # incl self

    rlen = jnp.sqrt(dist2 + params.epsilon)
    sg = spiky_grad(params, diff, rlen) * mask_ns[..., None]  # (N,K,3)

    gr = jnp.sum(sg, 1) / params.p0                           # (N,3)
    gr_dot = jnp.sum(gr * gr, -1)
    grad_dot = jnp.sum(jnp.sum((sg / params.p0) ** 2, -1), -1)
    denom = grad_dot + gr_dot

    p_ratio = pi / params.p0
    force_delta = state.velocity * (1.0 - p_ratio)[:, None] * -params.k
    force = state.force + jnp.where(state.alive[:, None], force_delta, 0.0)

    lambdas = -(p_ratio - 1.0) / (denom + params.relaxation)  # (N,)
    p6_ns = jnp.where(mask_ns, p6, 0.0)
    lamb_corr = -params.k_p * (p6_ns / params.lamb_corr_denom) ** params.e_p
    lam_sum = lambdas[:, None] + lambdas[nl.idx]
    deltas = jnp.where(mask_ns[..., None], (lam_sum + lamb_corr)[..., None] * sg, 0.0)
    deltas_sum = jnp.sum(deltas, 1) / params.p0
    delta = deltas_sum / (neighbors_len + state.counts)[:, None]

    est = jnp.where(state.alive[:, None], exyz + delta, exyz)

    a = state.alive
    af = a.astype(jnp.float32)
    n_alive = jnp.maximum(af.sum(), 1.0)
    e_ns = jnp.maximum(mask_ns.sum(), 1)
    e_all = jnp.maximum(nl.mask.sum(), 1)

    def amean(x):
        return jnp.sum(jnp.where(a, x, 0.0)) / n_alive

    diagnostics = {
        "velocity": amean(state.velocity.mean(-1)),
        "xyz": amean(state.xyz.mean(-1)),
        "estimate_xyz": amean(est.mean(-1)),
        "poly6_values": jnp.sum(p6) / e_all,
        "pi": amean(pi),
        "p_ratio": amean(p_ratio),
        "force_delta": amean(force_delta.mean(-1)),
        "lambdas": amean(lambdas),
        "lamb_corr": jnp.sum(jnp.where(mask_ns, lamb_corr, 0.0)) / e_ns,
        "estimate_xyz_delta": amean(delta.mean(-1)),
        "neighbors": amean(neighbors_len),
        "overflow": nl.overflow,
    }
    return state._replace(estimate_xyz=est, force=force), diagnostics


def warn_capacity_overflow(diags, context: str, strict: bool = False,
                           log=print) -> int:
    """Surface neighbor-grid capacity overflow as a pipeline-level warning.

    The static-capacity grids (dense_max_cells / dense_cell_capacity on the
    dense path, cell_capacity / knn_k on the padded path) DROP pairs when a
    scene exceeds them — physics degrades silently where the reference's
    dynamic torch_cluster allocation (gm_dynamics.py:10) never truncates.
    Call after a solver tick with its stacked ``diags``; returns the total
    dropped-point count. ``strict`` raises instead (--strict_capacity).
    """
    ov = diags.get("overflow")
    total = int(np.sum(np.asarray(ov))) if ov is not None else 0
    if total > 0:
        msg = (f"[capacity] {context}: neighbor grid dropped {total} "
               "point-slots this tick — pair sums are missing particles. "
               "Raise dense_max_cells / dense_cell_capacity (dense path) or "
               "cell_capacity / KNN_K (padded path) to cover the scene.")
        if strict:
            raise RuntimeError(msg + " (--strict_capacity raised)")
        log(msg)
    return total


def solver_loop(state: ParticleState, params: PBFParams, iterations: int,
                rigid: Optional["RigidBody"] = None, dense: bool = True,
                grid_reuse: bool = True):
    """N Jacobi iterations with the reference's counts schedule (the train
    loop calls update_solver_counts after each projection —
    train_physical_particle.py:292-298). lax.scan-based. ``dense`` selects
    the cell-pair MXU projection (see sim/pbf_dense.py) over the padded-list
    path. With ``dense`` and no rigid body, ``grid_reuse`` (default) bins
    once per tick and keeps the Jacobi loop in slot space
    (pbf_dense.project_iterations_dense) — the reference's per-iteration
    rebuild is a GPU habit, not physics; pass False for the
    rebuild-every-iteration schedule."""
    if dense:
        from fluidnexus_tpu.sim.pbf_dense import (project_gas_constraints_dense,
                                                  project_iterations_dense)
        if rigid is None and grid_reuse:
            return project_iterations_dense(state, params, iterations,
                                            counts_step=1.0)

    def body(st, _):
        if dense:
            st, diag = project_gas_constraints_dense(st, params)
        else:
            st, diag = project_gas_constraints(st, params)
        if rigid is not None:
            st = project_rigid_constraints(st, rigid, params)
        st = st._replace(counts=st.counts + 1.0)
        return st, diag

    return jax.lax.scan(body, state, None, length=iterations)


def confirm_guess(state: ParticleState, params: PBFParams) -> ParticleState:
    """Commit estimates: v = dx/dt, zero v for sub-epsilon moves, keep old xyz
    there (confirm_guess_hidden_particles, gm_dynamics.py:1323-1338)."""
    dx = state.estimate_xyz - state.xyz
    vel = dx / params.secs
    tiny = jnp.linalg.norm(dx, axis=1) < params.epsilon
    vel = jnp.where(tiny[:, None], 0.0, vel)
    xyz = jnp.where((tiny | ~state.alive)[:, None], state.xyz, state.estimate_xyz)
    return state._replace(velocity=jnp.where(state.alive[:, None], vel, 0.0), xyz=xyz)


def neighbor_counts(state: ParticleState, params: PBFParams):
    """Non-self neighbor counts within H (remove_invalid_particles, :1033)."""
    nl = radius_graph(state.xyz, params.h, k=params.knn_k, loop=False, alive=state.alive,
                      table_size=params.table_size, cell_capacity=params.cell_capacity)
    return nl.mask.sum(-1)


def remove_invalid(state: ParticleState, params: PBFParams) -> ParticleState:
    """Kill particles with < min_neighbors neighbors (alive-mask clear)."""
    if params.min_neighbors < 0:
        return state
    cnt = neighbor_counts(state, params)
    keep = (cnt >= params.min_neighbors) & state.alive
    return state._replace(alive=keep)


def splat_velocity_to_points(points, point_alive, state: ParticleState, params: PBFParams,
                             use_estimate=True, velocity=None, dense=None):
    """Poly6-weighted velocity splat hidden->arbitrary points, returning the
    position delta (update_visual_particles, gm_dynamics.py:1360-1402:
    delta = sum_j w_j v_j * secs / sum_j w_j).

    ``dense`` (default: on TPU) routes through the two-lattice Pallas splat
    (pbf_pallas.splat_slots) instead of the padded radius_query top-K path
    — every in-radius source contributes (no K truncation; torch_cluster's
    max_num_neighbors cap is a CUDA memory bound, not physics)."""
    src = state.estimate_xyz if use_estimate else state.xyz
    vel = state.velocity if velocity is None else velocity
    if dense is None:
        dense = jax.default_backend() == "tpu"
    if dense:
        return _splat_delta_dense(src, vel, points, state.alive, point_alive,
                                  params, None, None)
    nl = radius_query(src, points, params.h, k=params.knn_k, alive_x=state.alive,
                      alive_y=point_alive, table_size=params.table_size,
                      cell_capacity=params.cell_capacity)
    diff = points[:, None, :] - src[nl.idx]
    dist2 = jnp.sum(diff * diff, -1)
    p6 = jnp.where(nl.mask, poly6(params, dist2), 0.0)
    wv = jnp.einsum("vk,vkc->vc", p6, vel[nl.idx])
    sum_p6 = jnp.maximum(p6.sum(-1), params.epsilon)
    return wv * params.secs / sum_p6[:, None]


def update_visual(visual: VisualState, state: ParticleState, params: PBFParams) -> VisualState:
    delta = splat_velocity_to_points(visual.xyz, visual.alive, state, params)
    return visual._replace(xyz=jnp.where(visual.alive[:, None], visual.xyz + delta, visual.xyz))


# --------------------------- differentiable NN paths ------------------------


def visual_xyz_from_nn(visual_xyz, visual_alive, estimate_xyz_nn, state: ParticleState,
                       params: PBFParams, dense=None, grid=None, planes=None):
    """Differentiable advection of (detached) visual particles driven by the
    learnable hidden positions (get_visual_xyz_from_nn, gm_dynamics.py:1453-1500).
    estimate_xyz_nn is in WORLD units (the optimizer's down-scaled space).

    ``dense`` (default: on TPU) routes through the two-lattice Pallas splat
    with an ANALYTIC custom VJP (pbf_pallas.splat_slots / splat_bwd_slots)
    instead of the padded radius_query top-K path, whose candidate sort +
    (Nq, K) gathers + two scatter-add adjoints the r4 device trace pinned at
    ~250 ms of the 292 ms phase-C fit step at the 28k recon workload."""
    est = estimate_xyz_nn * params.scale_factor
    vel = (est - state.xyz) / params.secs
    vx = jax.lax.stop_gradient(visual_xyz)
    if dense is None:
        dense = jax.default_backend() == "tpu"
    if dense:
        return vx + _splat_delta_dense(est, vel, vx, state.alive, visual_alive,
                                       params, grid, planes)
    nl = radius_query(jax.lax.stop_gradient(est), vx, params.h, k=params.knn_k,
                      alive_x=state.alive, alive_y=visual_alive,
                      table_size=params.table_size, cell_capacity=params.cell_capacity)
    diff = vx[:, None, :] - est[nl.idx]
    dist2 = jnp.sum(diff * diff, -1)
    p6 = jnp.where(nl.mask, poly6(params, dist2), 0.0)
    wv = jnp.einsum("vk,vkc->vc", p6, vel[nl.idx])
    sum_p6 = jnp.maximum(p6.sum(-1), params.epsilon)
    return vx + wv * params.secs / sum_p6[:, None]


def _zero_cotangent(tree):
    """Cotangents for a shared-geometry pytree arg: float0 for int/bool
    leaves, concrete zeros for float leaves. Callers pass these trees wrapped
    in stop_gradient, whose transpose drops the cotangent immediately — the
    grid-build graph is never transposed (zeros are dead on arrival)."""
    if tree is None:
        return None
    return jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_
        else jnp.zeros_like(x), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _splat_delta_dense(src, vel, points, src_alive, point_alive,
                       params: PBFParams, grid=None, planes=None):
    """delta (Nq, 3) = secs * (sum_j W_ij vel_j) / max(sum_j W_ij, eps) via
    the two-lattice dense-grid Pallas kernels, differentiable in ``src``
    (through W) and ``vel``. ``points`` is treated as detached (every caller
    stop-gradients it); dead / capacity-dropped queries return delta 0 and
    dropped sources contribute nothing (overflow is surfaced by
    check_capacity_overflow on the pipelines' diagnostics).

    ``grid``/``planes`` optionally inject a PRE-BUILT source grid (must be
    build_dense_grid(stop_gradient(src), h, src_alive, C, M) and its
    sentinel planes, both stop-gradient-wrapped) — the phase-C fit step
    shares one build between this advection and the gas-density loss, which
    evaluate at the same positions."""
    delta, _ = _splat_delta_dense_fwd(src, vel, points, src_alive,
                                      point_alive, params, grid, planes)
    return delta


def _splat_delta_dense_fwd(src, vel, points, src_alive, point_alive,
                           params: PBFParams, grid_in=None, planes_in=None):
    from fluidnexus_tpu.ops.neighbors import (bin_queries, build_dense_grid,
                                              point_gather, slot_gather)
    from fluidnexus_tpu.sim.pbf_pallas import _planes, splat_slots

    C, M = params.dense_max_cells, params.dense_cell_capacity
    grid = grid_in if grid_in is not None else build_dense_grid(
        jax.lax.stop_gradient(src), params.h, src_alive, C, M)
    qgrid, rnbr = bin_queries(grid, params.h,
                              jax.lax.stop_gradient(points), point_alive,
                              C, M)
    planes = planes_in if planes_in is not None else _planes(grid)
    qplanes = _planes(qgrid)
    vel_s = slot_gather(grid, vel)
    wv_s, ws_s = splat_slots(grid, qgrid, vel_s, float(params.h),
                             planes=planes, qplanes=qplanes)
    c6 = jnp.float32(params.poly6_term1)
    # c6 is applied OUTSIDE the kernel so the eps clamp matches the padded
    # path's max(sum c6*w, eps) exactly. wv/ws leave slot space in ONE packed
    # row gather (the gathers are latency-bound row DMAs — see pbf_pallas
    # module docstring).
    wvs_pad = jnp.concatenate([
        jnp.concatenate([wv_s * c6, ws_s[..., None] * c6], -1),
        jnp.zeros((1, M, 4), jnp.float32)], 0)
    wvs = point_gather(qgrid, wvs_pad)                     # (Nq, 4)
    wv, ws = wvs[:, :3], wvs[:, 3]
    S = jnp.maximum(ws, params.epsilon)
    delta = params.secs * wv / S[:, None]
    # grid_in/planes_in ride the residuals as None-or-tree so the bwd's
    # cotangent STRUCTURE (None vs zeros) is static pytree structure
    return delta, (grid, qgrid, rnbr, planes, qplanes, vel_s, ws, delta,
                   grid_in, planes_in)


def _splat_delta_dense_bwd(params: PBFParams, res, g):
    from fluidnexus_tpu.ops.neighbors import point_gather, slot_gather
    from fluidnexus_tpu.sim.pbf_pallas import splat_bwd_slots

    (grid, qgrid, rnbr, planes, qplanes, vel_s, ws, delta,
     grid_in, planes_in) = res
    M = grid.capacity
    c6 = jnp.float32(params.poly6_term1)
    S = jnp.maximum(ws, params.epsilon)
    p = (c6 * params.secs) * g / S[:, None]                # (Nq, 3)
    q = jnp.where(ws < params.epsilon, 0.0,
                  c6 * jnp.sum(g * delta, -1) / S)         # (Nq,)
    pq_s = slot_gather(qgrid, jnp.concatenate([p, q[:, None]], -1))
    p_s, q_s = pq_s[..., :3], pq_s[..., 3]                 # dead slots -> 0
    gx_s, gv_s = splat_bwd_slots(grid, qgrid, rnbr, vel_s, p_s, q_s,
                                 float(params.h), planes=planes,
                                 qplanes=qplanes)
    zrow = jnp.zeros((1, M, 6), jnp.float32)
    gsv = point_gather(grid, jnp.concatenate(
        [jnp.concatenate([gx_s, gv_s], -1), zrow], 0))     # (N, 6)
    g_src, g_vel = gsv[:, :3], gsv[:, 3:]
    return (g_src, g_vel, jnp.zeros_like(g),
            np.zeros(grid.prow.shape, jax.dtypes.float0),
            np.zeros(ws.shape, jax.dtypes.float0),
            _zero_cotangent(grid_in), _zero_cotangent(planes_in))


_splat_delta_dense.defvjp(_splat_delta_dense_fwd, _splat_delta_dense_bwd)


def density_ratio_at(positions, alive, imass, params: PBFParams, dense=None,
                     grid=None, planes=None):
    """rho/rho0 at given (scaled-space) positions — the gas-constraint loss
    (get_gas_constraints_from_exyz_nn, gm_dynamics.py:1269-1296).

    ``dense`` (default: on TPU) routes through the dense-grid Pallas density
    with an ANALYTIC custom VJP (fwd: density_slots_v2, bwd: ONE
    phase-2-shaped kernel) instead of the padded top-K path, whose
    radius_graph build + (N, K) gathers the r4 device trace pinned at
    ~120 ms per call at the 28k recon workload — with two gas losses per
    fit step it dominated the phase-C iteration. Dead/overflow-dropped
    particles read a self-only density and zero gradient (the fit losses
    mask by ``alive``; overflow is surfaced by check_capacity_overflow)."""
    if dense is None:
        dense = jax.default_backend() == "tpu"
    if dense:
        return _density_ratio_dense(positions, alive, imass, params, grid,
                                    planes)
    nl = radius_graph(jax.lax.stop_gradient(positions), params.h, k=params.knn_k, loop=True,
                      alive=alive, table_size=params.table_size,
                      cell_capacity=params.cell_capacity)
    diff = positions[:, None, :] - positions[nl.idx]
    dist2 = jnp.sum(diff * diff, -1)
    p6 = jnp.where(nl.mask, poly6(params, dist2), 0.0)
    pi = p6.sum(-1) / imass
    return pi / params.p0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _density_ratio_dense(positions, alive, imass, params: PBFParams,
                         grid=None, planes=None):
    ratio, _ = _density_ratio_dense_fwd(positions, alive, imass, params,
                                        grid, planes)
    return ratio


def _density_ratio_dense_fwd(positions, alive, imass, params: PBFParams,
                             grid_in=None, planes_in=None):
    from fluidnexus_tpu.ops.neighbors import build_dense_grid, point_gather
    from fluidnexus_tpu.sim.pbf_pallas import _planes, density_slots_v2

    C, M = params.dense_max_cells, params.dense_cell_capacity
    grid = grid_in if grid_in is not None else build_dense_grid(
        jax.lax.stop_gradient(positions), params.h, alive, C, M)
    planes = planes_in if planes_in is not None else _planes(grid)
    pi_s = density_slots_v2(grid, float(params.h), float(params.epsilon),
                            float(params.poly6_term1),
                            float(params.spiky_grad_term1), planes=planes)
    # dropped points read the sentinel row -> self-only density
    w_self = jnp.float32(params.poly6_term1 * params.h ** 6)
    pi_pad = jnp.concatenate(
        [pi_s, jnp.full((1, M), w_self, jnp.float32)], 0)
    pi_n = point_gather(grid, pi_pad)
    ratio = pi_n / imass / params.p0
    return ratio, (grid, planes, imass, pi_n, grid_in, planes_in)


def _density_ratio_dense_bwd(params: PBFParams, res, g):
    from fluidnexus_tpu.ops.neighbors import point_gather, slot_gather
    from fluidnexus_tpu.sim.pbf_pallas import density_bwd_slots_v2

    grid, planes, imass, pi_n, grid_in, planes_in = res
    M = grid.capacity
    g_rho = g / (imass * params.p0)                # dL/d pi per particle
    g_s = slot_gather(grid, g_rho)                 # (C+1, M), dead slots 0
    ds = density_bwd_slots_v2(grid, g_s, float(params.h),
                              float(params.poly6_term1), planes=planes)
    ds_pad = jnp.concatenate([ds, jnp.zeros((1, M, 3), jnp.float32)], 0)
    dpos = point_gather(grid, ds_pad)              # dropped -> 0
    dimass = -pi_n / (imass * imass * params.p0) * g
    return (dpos, np.zeros(g_rho.shape, jax.dtypes.float0), dimass,
            _zero_cotangent(grid_in), _zero_cotangent(planes_in))


_density_ratio_dense.defvjp(_density_ratio_dense_fwd, _density_ratio_dense_bwd)


def guess_from_nn(estimate_xyz_nn, state: ParticleState, params: PBFParams):
    """One more simulated tick from the NN positions, for the next-step gas
    loss (get_guess_hidden_particles_from_nn, gm_dynamics.py:1302-1320).
    Returns scaled-space positions."""
    if params.buoyancy_max_y > 0.0:
        coeff = 1.0 - estimate_xyz_nn[:, 1:2] / params.buoyancy_max_y
        cur_buoy = state.buoyancy * coeff
    else:
        cur_buoy = state.buoyancy
    est = estimate_xyz_nn * params.scale_factor
    tmp_velocity = (est - state.xyz) / params.secs
    est_vel = tmp_velocity + cur_buoy * params.secs + params.secs * state.force
    return est + params.secs * est_vel


# --------------------------------- rigid body --------------------------------


@dataclasses.dataclass(frozen=True)
class RigidSpec:
    """Rigid-body config (ref setup_constants:151-167)."""

    kind: str = "sphere"                       # cuboid | sphere | cylinder
    particle_radius: float = 0.25
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # world units (scaled inside)
    cuboid_num: Tuple[int, int, int] = (10, 10, 10)
    sphere_radius: float = 1.0
    sphere_num: int = 1000
    cylinder_radius: float = 1.0
    cylinder_num: Tuple[int, int] = (64, 16)
    scale_factor: float = 100.0


class RigidBody(NamedTuple):
    xyz: jnp.ndarray     # (M,3) surface particles, scaled space
    spec_kind: int       # 0=cuboid 1=sphere 2=cylinder
    center: jnp.ndarray  # (3,) scaled space
    half_extent: jnp.ndarray  # kind-specific size params (3,)


def create_rigid_body(spec: RigidSpec, rng: np.random.Generator) -> RigidBody:
    """Surface particle cloud for the rigid body (create_rigid_body,
    gm_dynamics.py:612-672)."""
    diam = 2 * spec.particle_radius
    if spec.kind == "cuboid":
        xn, yn, zn = spec.cuboid_num
        pts = []
        for i in range(xn):
            for j in range(yn):
                for kk in range(zn):
                    if 0 < i < xn - 1 and 0 < j < yn - 1 and 0 < kk < zn - 1:
                        continue
                    pts.append([i * diam - xn // 2 * diam, j * diam - yn // 2 * diam, kk * diam - zn // 2 * diam])
        xyz = np.array(pts, np.float32)
        half = np.array([xn * diam, yn * diam, zn * diam], np.float32) / 2
        kind = 0
    elif spec.kind == "sphere":
        phi = rng.uniform(0, 2 * np.pi, spec.sphere_num)
        cos_t = rng.uniform(-1, 1, spec.sphere_num)
        theta = np.arccos(cos_t)
        xyz = np.stack(
            [spec.sphere_radius * np.sin(theta) * np.cos(phi),
             spec.sphere_radius * np.sin(theta) * np.sin(phi),
             spec.sphere_radius * np.cos(theta)], 1
        ).astype(np.float32)
        half = np.array([spec.sphere_radius, 0, 0], np.float32)
        kind = 1
    elif spec.kind == "cylinder":
        ncyc, nh = spec.cylinder_num
        pts = []
        for i in range(ncyc):
            for j in range(nh):
                th = i * 2 * np.pi / ncyc
                pts.append([spec.cylinder_radius * np.cos(th), spec.cylinder_radius * np.sin(th), (j - nh / 2) * diam])
        xyz = np.array(pts, np.float32)
        half = np.array([spec.cylinder_radius, nh * diam / 2, 0], np.float32)
        kind = 2
    else:
        raise ValueError(spec.kind)
    center = np.asarray(spec.center, np.float32) * spec.scale_factor
    return RigidBody(
        xyz=jnp.asarray(xyz + center), spec_kind=kind,
        center=jnp.asarray(center), half_extent=jnp.asarray(half),
    )


def inside_rigid_body(rb: RigidBody, xyz):
    """Point-in-body test (check_inside_rigid_body, gm_dynamics.py:1186-1218)."""
    if rb.spec_kind == 0:
        lower, upper = rb.center - rb.half_extent, rb.center + rb.half_extent
        return jnp.all((xyz >= lower) & (xyz <= upper), -1)
    if rb.spec_kind == 1:
        return jnp.linalg.norm(xyz - rb.center, axis=-1) <= rb.half_extent[0]
    dxy = (xyz[:, 0] - rb.center[0]) ** 2 + (xyz[:, 1] - rb.center[1]) ** 2
    within_r = dxy <= rb.half_extent[0] ** 2
    within_h = jnp.abs(xyz[:, 2] - rb.center[2]) <= rb.half_extent[1]
    return within_r & within_h


def _push_out_of_rigid(rb: RigidBody, xyz, alive, params: PBFParams):
    """Project points inside the body onto the nearest surface particle
    (project_rigid_body_constraints, gm_dynamics.py:1220-1266: dp1 = -(p - nearest),
    i.e. the point is moved TO the nearest surface particle)."""
    inside = inside_rigid_body(rb, xyz) & alive
    nl = radius_query(rb.xyz, xyz, params.h, k=8, alive_y=inside)
    d2 = jnp.sum((xyz[:, None] - rb.xyz[nl.idx]) ** 2, -1)
    d2 = jnp.where(nl.mask, d2, jnp.inf)
    nearest = nl.idx[jnp.arange(xyz.shape[0]), jnp.argmin(d2, -1)]
    has_near = jnp.any(nl.mask, -1)
    target = rb.xyz[nearest]
    return jnp.where((inside & has_near)[:, None], target, xyz)


def project_rigid_constraints(state: ParticleState, rb: RigidBody, params: PBFParams) -> ParticleState:
    return state._replace(estimate_xyz=_push_out_of_rigid(rb, state.estimate_xyz, state.alive, params))


def project_rigid_constraints_visual(visual: VisualState, rb: RigidBody, params: PBFParams) -> VisualState:
    return visual._replace(xyz=_push_out_of_rigid(rb, visual.xyz, visual.alive, params))
