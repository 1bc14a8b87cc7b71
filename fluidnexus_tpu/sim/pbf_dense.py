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


def project_gas_constraints_dense(state: ParticleState, params: PBFParams,
                                  grid: DenseGrid = None, backend: str = None):
    """Dense-grid PBF density projection + drag force.

    Drop-in for ``pbf.project_gas_constraints`` (same (state, diagnostics)
    contract, reference gm_dynamics.py:1076-1184); see module docstring for
    the truncation-semantics difference. ``grid`` may be passed to reuse a
    build; by default the grid is rebuilt from the current estimates exactly
    as the reference re-runs radius_graph each Jacobi iteration.

    ``backend``: 'pallas' (fused VMEM pair blocks + empty-cell skipping,
    sim/pbf_pallas.py), 'xla' (scan of batched blocks), or None = pallas on
    TPU, xla elsewhere (interpret-mode pallas is minutes-slow on CPU).
    """
    exyz = state.estimate_xyz
    C = params.dense_max_cells
    M = params.dense_cell_capacity
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if grid is None:
        grid = build_dense_grid(exyz, params.h, state.alive, C, M)

    xc_all = grid.bxyz[:-1]                                   # (C, M, 3)
    mc_all = grid.bmask[:-1]                                  # (C, M)
    uidx = jnp.arange(C, dtype=jnp.int32)
    eye = jnp.eye(M, dtype=bool)[None]
    r = jnp.asarray(params.h, exyz.dtype)
    offsets = jnp.asarray(_OFFSETS, exyz.dtype) * r           # (27, 3)

    # ---------------- phase 1: density, lambda denominators ----------------
    def p1_body(carry, onb):
        pi, sg, c2d2, nlen, s_p6, s_edges = carry
        shift, nb = onb
        xn = grid.bxyz[nb]
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
        from fluidnexus_tpu.sim.pbf_pallas import _planes, phase1_slots_v2
        planes = _planes(grid)
        pi_s, sg_s, c2d2_s, nlen_s, s_p6, s_edges = phase1_slots_v2(
            grid, float(params.h), float(params.epsilon),
            float(params.poly6_term1), float(params.spiky_grad_term1),
            planes=planes)
    elif backend == "pallas_v1":
        from fluidnexus_tpu.sim.pbf_pallas import _gathers, phase1_slots
        gathered = _gathers(grid)
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

    # ONE packed slot_gather for both per-point inputs (imass, counts): two
    # separate (C+1, M) gathers cost ~2x the HBM round trips of one 2-col row
    # gather at the bench workload
    ic_s = slot_gather(grid, jnp.stack([state.imass, state.counts], -1))[:-1]
    imass_s = jnp.where(mc_all, ic_s[..., 0], 1.0)
    counts_s = ic_s[..., 1]
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
        xn = grid.bxyz[nb]
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
