"""Dense cell-pair PBF projection — the TPU-native solver hot loop.

Matches ``project_gas_constraints`` (reference gm_dynamics.py:1076-1184)
but computes every neighbor reduction as batched (M, M) cell-pair blocks
over a :class:`~fluidnexus_tpu.ops.neighbors.DenseGrid` instead of a padded
(N, K) neighbor list:

- pair distances ride the MXU (``d2 = |xi|^2 + |xj|^2 - 2 xi.xj^T`` per
  block, in cell-relative coordinates so f32 stays exact),
- kernel sums ``sum_j w_ij`` are row-reductions, and the two vector sums
  (spiky-gradient and position-delta) factor into ``rowsum(W) * xi - W @ Xj``
  — one (M, M) @ (M, 3) matmul per block,
- there is NO top-K selection: a lax.scan over the 27 cell offsets
  accumulates per-slot sums, so no (N, 27M) candidate tensor, no sort, and
  no scatter in the loop.

Because no truncation happens, results are EXACT over all in-radius pairs.
The padded path (and the reference's torch_cluster CUDA path,
gm_dynamics.py:1081) truncates each particle's neighbors at ``knn_k`` with
an arbitrary-first subset — a GPU memory artifact, not physics. Where no
truncation occurs the two paths agree to f32 tolerance
(tests/test_pbf_dense.py); under truncation the dense path is the more
faithful PBF discretization. Cell-capacity overflow (static ``max_cells`` /
``capacity`` exceeded) drops points from pair sums and is reported in the
``overflow`` diagnostic, mirroring the padded path's bucket overflow.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fluidnexus_tpu.ops.neighbors import (DenseGrid, _OFFSETS, build_dense_grid,
                                          point_gather, slot_gather)
from fluidnexus_tpu.sim.pbf import PBFParams
from fluidnexus_tpu.sim.state import ParticleState


def _ipow(x, e: float):
    """x ** e with static small-integer exponents unrolled to multiplies
    (the reference's E_P = 4.0 would otherwise lower to an exp/log chain on
    the VPU — measured as the dominant transcendental in the block kernel)."""
    if float(e).is_integer() and 0 <= int(e) <= 8:
        n = int(e)
        if n == 0:
            return jnp.ones_like(x)
        acc = x
        for _ in range(n - 1):
            acc = acc * x
        return acc
    return jnp.power(x, e)


def _pair_terms(params: PBFParams, xc, mc, xn, mn, self_block, shift):
    """Shared per-block quantities.

    xc: (C, M, 3) center-cell slot coords (cell-relative)
    xn: (C, M, 3) neighbor-cell slot coords (relative to THEIR cell)
    shift: (3,) offset * r — neighbor corner minus center corner
    Returns (d2, w_all, w_ns, cgrad, in_list) each (C, M, M) with
    pair (i, j) = center slot i x neighbor slot j.
    """
    xo = xn + shift[None, None, :]
    cross = jnp.einsum("cmd,cnd->cmn", xc, xo, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    d2 = (jnp.sum(xc * xc, -1)[:, :, None]
          + jnp.sum(xo * xo, -1)[:, None, :] - 2.0 * cross)
    d2 = jnp.where(self_block, 0.0, jnp.maximum(d2, 0.0))

    pair_ok = mc[:, :, None] & mn[:, None, :]
    h2 = params.h2
    t2 = h2 - d2
    w_all = jnp.where(pair_ok & (d2 < h2), params.poly6_term1 * t2 * t2 * t2, 0.0)
    w_ns = jnp.where(self_block, 0.0, w_all)
    # spiky-gradient scalar coefficient: sg_ij = cgrad_ij * (xi - xj)
    rlen = jnp.sqrt(d2 + params.epsilon)
    cgrad = jnp.where(pair_ok & (rlen < params.h) & ~self_block,
                      -params.spiky_grad_term1 * (params.h - rlen) ** 2
                      / (rlen + params.epsilon), 0.0)
    in_list = pair_ok & (d2 <= h2)
    return d2, w_all, w_ns, cgrad, in_list


def _project_core(grid: DenseGrid, params: PBFParams, backend: str,
                  planes, imass_s, counts_s):
    """One Jacobi projection entirely in SLOT space.

    ``planes`` carries the CURRENT sentinel-filled coordinates
    (``pbf_pallas._planes(grid, bxyz)``) — the slot-space tick
    (:func:`project_iterations_dense`) refreshes coordinates per iteration
    while reusing the cell assignment, so distances stay exact even when the
    assignment is one-tick stale. ``imass_s``/``counts_s`` are (C, M) slot
    fields (imass_s must be 1 at dead slots).

    Returns (delta_s, pi_s, p_ratio_s, lam_s, nlen_s, s_p6, s_edges,
    s_corr, s_ns); the per-slot outputs are garbage at dead slots (never
    gathered back to point space).
    """
    C = grid.max_cells
    M = grid.capacity
    cnt, bs, _sent = planes
    xc_all = bs[:-1]                                          # (C, M, 3)
    mc_all = grid.bmask[:-1]                                  # (C, M)
    uidx = jnp.arange(C, dtype=jnp.int32)
    eye = jnp.eye(M, dtype=bool)[None]
    r = jnp.asarray(params.h, bs.dtype)
    offsets = jnp.asarray(_OFFSETS, bs.dtype) * r             # (27, 3)
    if backend == "pallas_v1":
        # v1 gathered tuple rebuilt from the current planes (== _gathers
        # when bxyz is the stored grid coords)
        gathered = (cnt, bs, bs.transpose(0, 2, 1)[grid.nbr].reshape(C, 81, M))

    # ---------------- phase 1: density, lambda denominators ----------------
    def p1_body(carry, onb):
        pi, sg, c2d2, nlen, s_p6, s_edges = carry
        shift, nb = onb
        xn = bs[nb]
        mn = grid.bmask[nb]
        self_block = (nb == uidx)[:, None, None] & eye
        d2, w_all, _, cgrad, in_list = _pair_terms(
            params, xc_all, mc_all, xn, mn, self_block, shift)
        pi = pi + jnp.sum(w_all, -1)
        rs = jnp.sum(cgrad, -1)                               # (C, M)
        sg = sg + rs[..., None] * xc_all - jnp.einsum(
            "cmn,cnd->cmd", cgrad, xn + shift[None, None, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        c2d2 = c2d2 + jnp.sum(cgrad * cgrad * d2, -1)
        nlen = nlen + jnp.sum(in_list, -1).astype(jnp.float32)
        s_p6 = s_p6 + jnp.sum(w_all)
        s_edges = s_edges + jnp.sum(in_list)
        return (pi, sg, c2d2, nlen, s_p6, s_edges), None

    if backend == "pallas":
        from fluidnexus_tpu.sim.pbf_pallas import phase1_slots_v2
        pi_s, sg_s, c2d2_s, nlen_s, s_p6, s_edges = phase1_slots_v2(
            grid, float(params.h), float(params.epsilon),
            float(params.poly6_term1), float(params.spiky_grad_term1),
            planes=planes)
    elif backend == "pallas_v1":
        from fluidnexus_tpu.sim.pbf_pallas import phase1_slots
        pi_s, sg_s, c2d2_s, nlen_s, s_p6, s_edges = phase1_slots(
            grid, float(params.h), float(params.epsilon),
            float(params.poly6_term1), float(params.spiky_grad_term1),
            gathered=gathered)
    else:
        z = jnp.zeros((C, M), jnp.float32)
        (pi_s, sg_s, c2d2_s, nlen_s, s_p6, s_edges), _ = jax.lax.scan(
            p1_body,
            (z, jnp.zeros((C, M, 3), jnp.float32), z, z,
             jnp.float32(0.0), jnp.int32(0)),
            (offsets, grid.nbr.T))

    pi_s = pi_s / imass_s
    gr = sg_s / params.p0
    gr_dot = jnp.sum(gr * gr, -1)
    grad_dot = c2d2_s / (params.p0 * params.p0)
    p_ratio_s = pi_s / params.p0
    lam_s = -(p_ratio_s - 1.0) / (grad_dot + gr_dot + params.relaxation)
    lam_pad = jnp.concatenate([lam_s, jnp.zeros((1, M), jnp.float32)], 0)

    # ---------------- phase 2: position deltas ----------------
    denom = params.lamb_corr_denom

    def p2_body(carry, onb):
        dsum, s_corr, s_ns = carry
        shift, nb = onb
        xn = bs[nb]
        mn = grid.bmask[nb]
        ln = lam_pad[nb]                                      # (C, M)
        self_block = (nb == uidx)[:, None, None] & eye
        d2, _, w_ns, cgrad, in_list = _pair_terms(
            params, xc_all, mc_all, xn, mn, self_block, shift)
        corr = -params.k_p * _ipow(w_ns / denom, params.e_p)
        a = lam_s[:, :, None] + ln[:, None, :] + corr
        b = a * cgrad
        rs = jnp.sum(b, -1)
        dsum = dsum + rs[..., None] * xc_all - jnp.einsum(
            "cmn,cnd->cmd", b, xn + shift[None, None, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        mask_ns = in_list & ~self_block
        s_corr = s_corr + jnp.sum(jnp.where(mask_ns, corr, 0.0))
        s_ns = s_ns + jnp.sum(mask_ns)
        return (dsum, s_corr, s_ns), None

    if backend == "pallas":
        from fluidnexus_tpu.sim.pbf_pallas import phase2_slots_v2
        dsum_s, s_corr, s_ns = phase2_slots_v2(
            grid, lam_s, float(params.h), float(params.epsilon),
            float(params.poly6_term1), float(params.spiky_grad_term1),
            float(params.k_p), float(params.e_p), float(1.0 / denom),
            planes=planes)
    elif backend == "pallas_v1":
        from fluidnexus_tpu.sim.pbf_pallas import phase2_slots
        dsum_s, s_corr, s_ns = phase2_slots(
            grid, lam_s, float(params.h), float(params.epsilon),
            float(params.poly6_term1), float(params.spiky_grad_term1),
            float(params.k_p), float(params.e_p), float(1.0 / denom),
            gathered=gathered)
    else:
        (dsum_s, s_corr, s_ns), _ = jax.lax.scan(
            p2_body,
            (jnp.zeros((C, M, 3), jnp.float32), jnp.float32(0.0), jnp.int32(0)),
            (offsets, grid.nbr.T))

    # clamp only guards 0/0 in never-gathered invalid slots (any valid slot
    # has its self-pair in-list, so nlen >= 1 there)
    delta_s = dsum_s / params.p0 / jnp.maximum(nlen_s + counts_s, 1e-20)[..., None]
    return (delta_s, pi_s, p_ratio_s, lam_s, nlen_s,
            s_p6, s_edges, s_corr, s_ns)


def project_gas_constraints_dense(state: ParticleState, params: PBFParams,
                                  grid: DenseGrid = None, backend: str = None):
    """Dense-grid PBF density projection + drag force.

    Drop-in for ``pbf.project_gas_constraints`` (same (state, diagnostics)
    contract, reference gm_dynamics.py:1076-1184); see module docstring for
    the truncation-semantics difference. ``grid`` may be passed to reuse a
    build; by default the grid is rebuilt from the current estimates exactly
    as the reference re-runs radius_graph each Jacobi iteration. For a full
    multi-iteration tick prefer :func:`project_iterations_dense`, which
    builds the grid ONCE and keeps the whole Jacobi loop in slot space.

    ``backend``: 'pallas' (fused VMEM pair blocks + empty-cell skipping,
    sim/pbf_pallas.py), 'xla' (scan of batched blocks), or None = pallas on
    TPU, xla elsewhere (interpret-mode pallas is minutes-slow on CPU).
    """
    from fluidnexus_tpu.sim.pbf_pallas import _planes

    exyz = state.estimate_xyz
    C = params.dense_max_cells
    M = params.dense_cell_capacity
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if grid is None:
        grid = build_dense_grid(exyz, params.h, state.alive, C, M)
    mc_all = grid.bmask[:-1]                                  # (C, M)

    # ONE packed slot_gather for both per-point inputs (imass, counts): two
    # separate (C+1, M) gathers cost ~2x the HBM round trips of one 2-col row
    # gather at the bench workload
    ic_s = slot_gather(grid, jnp.stack([state.imass, state.counts], -1))[:-1]
    imass_s = jnp.where(mc_all, ic_s[..., 0], 1.0)
    counts_s = ic_s[..., 1]

    (delta_s, pi_s, p_ratio_s, lam_s, nlen_s,
     s_p6, s_edges, s_corr, s_ns) = _project_core(
        grid, params, backend, _planes(grid), imass_s, counts_s)

    # ---------------- back to point space ----------------
    # ONE packed point_gather: five separate (N,)-row gathers from the
    # (C+1, M) slot tables were ~4 ms/projection of serial XLA gather time at
    # the bench workload; packing [delta|pi|p_ratio|lam|nlen] into one
    # 7-column row gather streams the same rows once
    zrow = lambda f: jnp.concatenate(
        [f, jnp.zeros((1,) + f.shape[1:], f.dtype)], 0)
    packed_s = jnp.concatenate(
        [delta_s, pi_s[..., None], p_ratio_s[..., None], lam_s[..., None],
         nlen_s[..., None]], -1)                           # (C, M, 7)
    pt = point_gather(grid, zrow(packed_s))                # (N, 7)
    delta = pt[:, 0:3]
    pi = pt[:, 3]
    p_ratio = pt[:, 4]
    lambdas = pt[:, 5]
    neighbors_len = pt[:, 6]

    force_delta = state.velocity * (1.0 - p_ratio)[:, None] * -params.k
    force = state.force + jnp.where(state.alive[:, None], force_delta, 0.0)
    est = jnp.where(state.alive[:, None], exyz + delta, exyz)

    a = state.alive
    af = a.astype(jnp.float32)
    n_alive = jnp.maximum(af.sum(), 1.0)
    e_ns = jnp.maximum(s_ns, 1)
    e_all = jnp.maximum(s_edges, 1)

    def amean(x):
        return jnp.sum(jnp.where(a, x, 0.0)) / n_alive

    diagnostics = {
        "velocity": amean(state.velocity.mean(-1)),
        "xyz": amean(state.xyz.mean(-1)),
        "estimate_xyz": amean(est.mean(-1)),
        "poly6_values": s_p6 / e_all,
        "pi": amean(pi),
        "p_ratio": amean(p_ratio),
        "force_delta": amean(force_delta.mean(-1)),
        "lambdas": amean(lambdas),
        "lamb_corr": s_corr / e_ns,
        "estimate_xyz_delta": amean(delta.mean(-1)),
        "neighbors": amean(neighbors_len),
        "overflow": grid.overflow,
    }
    return state._replace(estimate_xyz=est, force=force), diagnostics


def _project_iterations_v3(state: ParticleState, params: PBFParams,
                           iterations: int, counts_step: float = 0.0):
    """Grid-reuse tick through the v3 transposed-IO kernels.

    Same contract and math as the generic :func:`project_iterations_dense`
    body, but every per-slot tensor in the Jacobi loop lives in the
    kernels' GROUPED slot-major layout (G, M, CPB)
    (pbf_pallas.cells_to_grouped) so kernel IO needs no relayout, and
    XLA-side the whole Jacobi update (delta apply, force accumulation,
    diagnostics) is trivially fused elementwise ops on those planes. Only
    the neighbor-side coordinate planes (+ lambda) are transposed back to
    cell-major per iteration (4 small tiled transposes). The r4 device
    trace pinned ~half of each 8.5 ms v2 iteration in XLA layout copies
    ({1,0,2}<->{2,1,0} on the (C,M,3)/(C,M,1) operands) and the
    between-kernel lambda chain; this body removes both (lambda and the
    delta scaling are computed in-kernel)."""
    from fluidnexus_tpu.sim import pbf_pallas as pp

    exyz = state.estimate_xyz
    C = params.dense_max_cells
    M = params.dense_cell_capacity
    grid = build_dense_grid(exyz, params.h, state.alive, C, M)
    mc_all = grid.bmask[:-1]                                   # (C, M)
    mG = pp.cells_to_grouped(mc_all)                           # (G, M, CPB)

    # once-per-tick point->slot gathers, packed into one row gather
    ivc = slot_gather(grid, jnp.concatenate(
        [state.imass[:, None], state.counts[:, None], state.velocity], -1))[:-1]
    imG = jnp.where(mG, pp.cells_to_grouped(ivc[..., 0]), 1.0)
    countsG0 = pp.cells_to_grouped(ivc[..., 1])
    velG = tuple(jnp.where(mG, pp.cells_to_grouped(ivc[..., 2 + k]), 0.0)
                 for k in range(3))

    cnt, _, sent = pp._planes(grid)            # cnt/sentinels grid-constant
    sent_c, sent_last = sent[:-1], sent[-1:]
    a = state.alive
    n_alive = jnp.maximum(a.astype(jnp.float32).sum(), 1.0)

    def samean(xg):
        return jnp.sum(jnp.where(mG, xg, 0.0)) / n_alive

    vel_diag = jnp.sum(jnp.where(a, state.velocity.mean(-1), 0.0)) / n_alive
    xyz_diag = jnp.sum(jnp.where(a, state.xyz.mean(-1), 0.0)) / n_alive
    est0_diag = jnp.sum(jnp.where(a, exyz.mean(-1), 0.0)) / n_alive

    h = float(params.h)
    eps = float(params.epsilon)
    c6 = float(params.poly6_term1)
    s45 = float(params.spiky_grad_term1)
    inv_p0 = 1.0 / float(params.p0)
    relax = float(params.relaxation)
    inv_denom = float(1.0 / params.lamb_corr_denom)

    # dead slots carry their SENTINEL coordinate on the center side too (as
    # in the v2 wrappers, where the center block is the sentinel-filled bs):
    # a dead center row then pairs in-radius only with its own sentinel
    # (the self-diagonal), so the closed-form n_dead corrections to
    # s_p6/s_edges stay exact. Deltas are mG-masked, so sentinels persist
    # across iterations.
    x0G = tuple(
        pp.cells_to_grouped(jnp.where(mc_all, grid.bxyz[:-1, :, k], sent_c))
        for k in range(3))
    gshape = x0G[0].shape

    def body(carry, it):
        xG3, fG3, cum_dmean = carry
        planes = tuple(        # xG3 dead rows already hold their sentinel
            jnp.concatenate([pp.grouped_to_cells(xG3[k], C), sent_last], 0)
            for k in range(3))
        lamG, piG, nlG, s_p6, s_edges = pp.phase1_slots_v3(
            grid, h, eps, c6, s45, inv_p0, relax,
            xG3[0], xG3[1], xG3[2], imG, (cnt,) + planes)
        lam_pad = jnp.concatenate(
            [pp.grouped_to_cells(lamG, C), jnp.zeros((1, M), jnp.float32)], 0)
        ncG = nlG + countsG0 + jnp.float32(counts_step) * it
        dxG, dyG, dzG, s_corr, s_ns = pp.phase2_slots_v3(
            grid, h, eps, c6, s45, float(params.k_p), float(params.e_p),
            inv_denom, inv_p0,
            xG3[0], xG3[1], xG3[2], lamG, ncG, (cnt,) + planes + (lam_pad,))
        # phase2 v3 emits UPDATED coordinates (x + delta applied in-kernel).
        # No mG select needed: dead rows inside processed strips get a zero
        # delta (per-slot-unique sentinels pair out of radius, the self
        # diagonal cg is zeroed), and rows the strip loop never touches
        # (cnt=0 padding cells, rows past ceil(cnt/S)*S) pass through via the
        # kernel's copy-init — so sentinel coordinates persist either way
        # (pinned by test_iterations_matches_per_iteration_rebuild).
        xG3_new = (dxG, dyG, dzG)
        dG3 = tuple(nx - x for nx, x in zip(xG3_new, xG3))
        xG3 = xG3_new
        p_ratioG = piG / imG * inv_p0
        # velG is zero-masked at build, so dead rows contribute no force
        fdG3 = tuple(v * (1.0 - p_ratioG) * -params.k for v in velG)
        fG3 = tuple(f + fd for f, fd in zip(fG3, fdG3))
        dmean = (jnp.sum(dG3[0]) + jnp.sum(dG3[1])
                 + jnp.sum(dG3[2])) / 3.0 / n_alive
        cum_dmean = cum_dmean + dmean
        diag = {
            "velocity": vel_diag,
            "xyz": xyz_diag,
            "estimate_xyz": est0_diag + cum_dmean,
            "poly6_values": s_p6 / jnp.maximum(s_edges, 1),
            "pi": samean(piG / imG),
            "p_ratio": samean(p_ratioG),
            "force_delta": (jnp.sum(fdG3[0]) + jnp.sum(fdG3[1])
                            + jnp.sum(fdG3[2])) / 3.0 / n_alive,
            "lambdas": samean(lamG),
            "lamb_corr": s_corr / jnp.maximum(s_ns, 1),
            "estimate_xyz_delta": dmean,
            "neighbors": samean(nlG),
            "overflow": grid.overflow,
        }
        return (xG3, fG3, cum_dmean), diag

    (xG3_f, fG3_f, _), diags = jax.lax.scan(
        body,
        (x0G, tuple(jnp.zeros(gshape, jnp.float32) for _ in range(3)),
         jnp.float32(0.0)),
        jnp.arange(iterations, dtype=jnp.float32))

    # back to point space ONCE: total position delta + accumulated force
    zpad = jnp.zeros((1, M, 6), jnp.float32)
    packed = jnp.concatenate([
        jnp.stack([pp.grouped_to_cells(xG3_f[k], C) - grid.bxyz[:-1, :, k]
                   for k in range(3)]
                  + [pp.grouped_to_cells(fG3_f[k], C) for k in range(3)], -1),
        zpad], 0)
    pt = point_gather(grid, packed)                # (N, 6); dropped/dead -> 0
    am = state.alive[:, None]
    est = jnp.where(am, exyz + pt[:, 0:3], exyz)
    force = state.force + jnp.where(am, pt[:, 3:6], 0.0)
    counts = state.counts + jnp.float32(counts_step) * iterations
    return state._replace(estimate_xyz=est, force=force, counts=counts), diags


def project_iterations_dense(state: ParticleState, params: PBFParams,
                             iterations: int, backend: str = None,
                             counts_step: float = 0.0):
    """``iterations`` Jacobi projections with the grid built ONCE per tick.

    The reference rebuilds its neighbor structure every Jacobi iteration
    (radius_graph at gm_dynamics.py:1081 inside the :1076-1184 loop) — a
    cheap habit on GPU where torch_cluster is fast relative to the scatter
    math, but the r4 device trace pinned the per-iteration rebuild (argsort
    + bucket scatters) plus the slot<->point round trips at ~8 of the
    12.7 ms/iteration, 2x the pair kernels themselves. This tick is the
    classic Verlet-list alternative: bin once from the post-Euler estimates,
    then keep the WHOLE Jacobi loop in slot space —

    - per iteration only the slot coordinates refresh (``xrel += delta_s``),
      so pair DISTANCES are exact; the cell ASSIGNMENT is up to one tick
      stale, which can only miss pairs whose binned axis separation exceeded
      ``h`` while the Jacobi deltas (small fractions of ``h`` by
      construction — they are density corrections) closed the gap,
    - imass / counts / velocity are gathered to slots once, the drag-force
      accumulation runs in slot space, and positions return to point space
      ONCE at tick end (dropped/dead points keep the guess, zero force
      delta — the per-iteration path gives overflow-dropped points a
      spurious ``-k*v`` drag from the sentinel ``p_ratio=0``; here they get
      none, which is the more honest degradation, surfaced either way by
      ``warn_capacity_overflow``),
    - diagnostics are computed as slot-space masked sums over the same alive
      denominator; with no overflow they equal the per-iteration path's to
      f32 tolerance (tests/test_pbf_dense.py::test_iterations_*).

    ``counts_step``: the reference's two counts schedules — 0.0 keeps
    ``state.counts`` fixed (train_physical_particle.py:292-293 presets
    counts = solver_iterations), 1.0 increments per projection
    (pbf.solver_loop).

    ``backend='pallas'`` (the TPU default) routes through the v3
    transposed-IO kernels (:func:`_project_iterations_v3`); 'pallas_v2'
    keeps the v2 per-projection kernels inside the generic body below,
    'xla' the scan-of-blocks formulation (the CPU default).
    """
    from fluidnexus_tpu.sim.pbf_pallas import _planes

    exyz = state.estimate_xyz
    C = params.dense_max_cells
    M = params.dense_cell_capacity
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return _project_iterations_v3(state, params, iterations, counts_step)
    if backend == "pallas_v2":
        backend = "pallas"
    grid = build_dense_grid(exyz, params.h, state.alive, C, M)
    mc_all = grid.bmask[:-1]
    m3 = mc_all[..., None]

    # once-per-tick point->slot gathers, packed into one row gather
    ivc = slot_gather(grid, jnp.concatenate(
        [state.imass[:, None], state.counts[:, None], state.velocity], -1))[:-1]
    imass_s = jnp.where(mc_all, ivc[..., 0], 1.0)
    counts_s0 = ivc[..., 1]
    vel_s = jnp.where(m3, ivc[..., 2:5], 0.0)

    cnt, _, sent = _planes(grid)           # cnt/sentinels are grid-constant
    a = state.alive
    n_alive = jnp.maximum(a.astype(jnp.float32).sum(), 1.0)

    def samean(x_s):
        """Slot-space equivalent of the per-point alive mean (dropped points
        contribute 0 on both paths — the point path reads the zero-padded
        sentinel row)."""
        return jnp.sum(jnp.where(mc_all, x_s, 0.0)) / n_alive

    # constant-per-tick diagnostics (velocity/xyz never change between
    # projections; estimate_xyz's mean advances by the delta mean)
    vel_diag = jnp.sum(jnp.where(a, state.velocity.mean(-1), 0.0)) / n_alive
    xyz_diag = jnp.sum(jnp.where(a, state.xyz.mean(-1), 0.0)) / n_alive
    est0_diag = jnp.sum(jnp.where(a, exyz.mean(-1), 0.0)) / n_alive

    def body(carry, it):
        xrel, force_s, cum_dmean = carry
        bs = jnp.where(grid.bmask[..., None],
                       jnp.concatenate([xrel, jnp.zeros((1, M, 3), xrel.dtype)], 0),
                       sent[..., None])
        counts_it = counts_s0 + jnp.float32(counts_step) * it
        (delta_s, pi_s, p_ratio_s, lam_s, nlen_s,
         s_p6, s_edges, s_corr, s_ns) = _project_core(
            grid, params, backend, (cnt, bs, sent), imass_s, counts_it)
        delta_s = jnp.where(m3, delta_s, 0.0)
        xrel = xrel + delta_s
        fd_s = jnp.where(m3, vel_s * (1.0 - p_ratio_s)[..., None] * -params.k,
                         0.0)
        force_s = force_s + fd_s
        dmean = jnp.sum(delta_s.mean(-1)) / n_alive
        cum_dmean = cum_dmean + dmean
        diag = {
            "velocity": vel_diag,
            "xyz": xyz_diag,
            "estimate_xyz": est0_diag + cum_dmean,
            "poly6_values": s_p6 / jnp.maximum(s_edges, 1),
            "pi": samean(pi_s),
            "p_ratio": samean(p_ratio_s),
            "force_delta": jnp.sum(fd_s.mean(-1)) / n_alive,
            "lambdas": samean(lam_s),
            "lamb_corr": s_corr / jnp.maximum(s_ns, 1),
            "estimate_xyz_delta": dmean,
            "neighbors": samean(nlen_s),
            "overflow": grid.overflow,
        }
        return (xrel, force_s, cum_dmean), diag

    (xrel_f, force_s_f, _), diags = jax.lax.scan(
        body,
        (grid.bxyz[:-1], jnp.zeros((C, M, 3), jnp.float32), jnp.float32(0.0)),
        jnp.arange(iterations, dtype=jnp.float32))

    # back to point space ONCE: total position delta + accumulated force
    zpad = jnp.zeros((1, M, 6), jnp.float32)
    packed = jnp.concatenate(
        [jnp.concatenate([xrel_f - grid.bxyz[:-1], force_s_f], -1), zpad], 0)
    pt = point_gather(grid, packed)                # (N, 6); dropped/dead -> 0
    am = state.alive[:, None]
    est = jnp.where(am, exyz + pt[:, 0:3], exyz)
    force = state.force + jnp.where(am, pt[:, 3:6], 0.0)
    counts = state.counts + jnp.float32(counts_step) * iterations
    return state._replace(estimate_xyz=est, force=force, counts=counts), diags
