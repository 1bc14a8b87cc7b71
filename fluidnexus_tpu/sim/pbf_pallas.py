"""Fused Pallas pair-block kernels for the dense PBF projection.

The XLA formulation in sim/pbf_dense.py materializes every (C, M, M) pair
tensor in HBM (device-profiled: ~100 ms/projection at exact f32 at the 28k
bench workload, ~40 GB of block-tensor traffic). These kernels keep each
(M, M) block in VMEM: per cell, the 27 neighbor-offset blocks are unrolled
in-kernel with compile-time shifts, and only per-slot reductions
((M, 1)/(M, 3)) ever leave the core.

In-kernel unit assignment (both device-measured — see the r3 status doc):
- pair distances: direct subtract-square on the VPU (exact f32; the
  |xi|^2+|xj|^2-2xi.xj MXU route needs 6-pass HIGHEST matmuls — Mosaic has
  no 3-pass tier — and benched no faster),
- ALL row reductions: one stacked [w|cg|...] @ [ones|xs^T] HIGHEST matmul
  per block — jnp.sum(axis=1) is a cross-lane shuffle tree on the VPU, the
  saturated unit, while the MXU sits idle,
- global diagnostics (s_p6, s_edges, s_corr, s_ns): recovered in XLA from
  the zeroed per-row outputs instead of (1,1) in-kernel accumulators.

Empty cells and empty neighbor blocks are SKIPPED at run time via
scalar-prefetched slot counts (`@pl.when`), so compute scales with occupied
cells, not the static `max_cells` cap — data-dependent sparsity XLA cannot
express. (A finer-grained center-row STRIP skip is scaffolded; STRIP=32/64
benched neutral-to-worse at mean fill 43/128 — branch overhead eats the
saved rows — so STRIP stays at M.)

Math parity: identical to pbf_dense._pair_terms except the spiky coefficient
uses ``rsqrt(d2 + eps)`` for both the length and the reciprocal (one VPU
transcendental instead of sqrt + divide); the relative difference vs the
padded path's ``1/(sqrt(d2+eps)+eps)`` is O(eps/rlen) ~ 1e-7 (asserted in
tests/test_pbf_dense.py::test_pallas_matches_xla).

Reference being replaced: torch_cluster.radius_graph + index_add_ per Jacobi
iteration (gm_dynamics.py:1076-1184).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnexus_tpu.ops.neighbors import _OFFSETS, DenseGrid

CPB = 8           # cells per program (VMEM budget allows 8 at M=128)
STRIP = 128       # center-row strip: strips past ceil(cnt/STRIP) are skipped
                  # (slots are front-compacted per cell — neighbors.py slotv),
                  # so pair work scales with live rows, not the static M cap
_SELF_J = 13      # index of the (0,0,0) offset in _OFFSETS


def _interpret():
    return jax.default_backend() != "tpu"


def _shift31(j, h):
    """(3, 1) offset*h column built from scalars (pallas forbids captured
    array constants)."""
    sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
    ri = lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    return jnp.where(ri == 0, sx, jnp.where(ri == 1, sy, sz))


def _phase1_kernel(h, eps, c6, s45, m, cnt_ref, ncnt_ref,
                   xc_ref, mc_ref, xng_ref, mng_ref,
                   pi_ref, sg_ref, c2_ref, nl_ref):
    h2 = h * h
    pid = pl.program_id(0)
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
    sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
    c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
    nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)
    # global sums (s_p6, s_edges) are recovered in XLA from the zeroed
    # per-row outputs: dead rows/cells contribute exact zeros here

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            for j in range(27):
                shift = _shift31(j, h)

                @pl.when(ncnt_ref[cell * 27 + j] > 0)
                def _():
                    xs = xng_ref[ci, 3 * j:3 * j + 3] + shift          # (3, M)
                    mn = mng_ref[ci, j].reshape(1, m)
                    for s in range(m // STRIP):
                        sl = slice(s * STRIP, (s + 1) * STRIP)

                        @pl.when(cnt_ref[cell] > s * STRIP)
                        def _():
                            xc = xc_ref[ci, sl]                # (S, 3)
                            mcf = mc_ref[ci, sl]               # (S, 1)
                            # direct subtract-square pair distances: exact
                            # f32 on the VPU; the |xi|^2+|xj|^2-2xi.xj MXU
                            # route needs 6-pass HIGHEST matmuls (Mosaic has
                            # no 3-pass tier) and benched slower
                            dx0 = xc[:, 0:1] - xs[0:1, :]
                            dx1 = xc[:, 1:2] - xs[1:2, :]
                            dx2 = xc[:, 2:3] - xs[2:3, :]
                            d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                            if j == _SELF_J:
                                seye = (lax.broadcasted_iota(
                                    jnp.int32, (STRIP, m), 0) + s * STRIP
                                    == lax.broadcasted_iota(
                                        jnp.int32, (STRIP, m), 1))
                                d2 = jnp.where(seye, 0.0, d2)
                            pm = mcf * mn
                            t2 = h2 - d2
                            w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0) * pm
                            inv = lax.rsqrt(d2 + eps)
                            rlen = (d2 + eps) * inv
                            hr = h - rlen
                            cg = jnp.where(rlen < h, (-s45) * hr * hr * inv,
                                           0.0) * pm
                            if j == _SELF_J:
                                cg = jnp.where(seye, 0.0, cg)
                            inl = pm * (d2 <= h2)
                            # ALL row-sums ride the MXU as one stacked
                            # (4S, M) @ (M, 4) against [ones | xs^T]: lane
                            # reductions (jnp.sum axis=1) are cross-lane
                            # shuffle trees on the VPU — the saturated unit
                            stack = jnp.concatenate(
                                [w, cg, cg * cg * d2, inl], axis=0)
                            ones_col = jnp.ones((m, 1), jnp.float32)
                            rhs = jnp.concatenate(
                                [ones_col, xs.T], axis=1)        # (M, 4)
                            rs = lax.dot_general(
                                stack, rhs, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (4S, 4)
                            S = STRIP
                            pi_ref[ci, sl] += rs[0:S, 0:1]
                            sg_ref[ci, sl] += (rs[S:2 * S, 0:1] * xc
                                               - rs[S:2 * S, 1:4])
                            c2_ref[ci, sl] += rs[2 * S:3 * S, 0:1]
                            nl_ref[ci, sl] += rs[3 * S:4 * S, 0:1]


def _phase2_kernel(h, eps, c6, s45, k_p, e_p, inv_denom, m, cnt_ref, ncnt_ref,
                   xc_ref, mc_ref, lamc_ref, xng_ref, mng_ref, lng_ref,
                   ds_ref, cr_ref, nsr_ref):
    h2 = h * h
    pid = pl.program_id(0)
    ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)
    cr_ref[...] = jnp.zeros(cr_ref.shape, cr_ref.dtype)
    nsr_ref[...] = jnp.zeros(nsr_ref.shape, nsr_ref.dtype)
    int_pow = float(e_p).is_integer() and 0 < int(e_p) <= 8

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            for j in range(27):
                shift = _shift31(j, h)

                @pl.when(ncnt_ref[cell * 27 + j] > 0)
                def _():
                    xs = xng_ref[ci, 3 * j:3 * j + 3] + shift
                    mn = mng_ref[ci, j].reshape(1, m)
                    ln = lng_ref[ci, j].reshape(1, m)
                    for s in range(m // STRIP):
                        sl = slice(s * STRIP, (s + 1) * STRIP)

                        @pl.when(cnt_ref[cell] > s * STRIP)
                        def _():
                            xc = xc_ref[ci, sl]
                            mcf = mc_ref[ci, sl]
                            lamc = lamc_ref[ci, sl]        # (S, 1)
                            # VPU subtract-square d2 — see _phase1_kernel
                            dx0 = xc[:, 0:1] - xs[0:1, :]
                            dx1 = xc[:, 1:2] - xs[1:2, :]
                            dx2 = xc[:, 2:3] - xs[2:3, :]
                            d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                            if j == _SELF_J:
                                seye = (lax.broadcasted_iota(
                                    jnp.int32, (STRIP, m), 0) + s * STRIP
                                    == lax.broadcasted_iota(
                                        jnp.int32, (STRIP, m), 1))
                                d2 = jnp.where(seye, 0.0, d2)
                            pm = mcf * mn
                            t2 = h2 - d2
                            w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0) * pm
                            if j == _SELF_J:
                                w = jnp.where(seye, 0.0, w)
                            inv = lax.rsqrt(d2 + eps)
                            rlen = (d2 + eps) * inv
                            hr = h - rlen
                            cg = jnp.where(rlen < h, (-s45) * hr * hr * inv,
                                           0.0) * pm
                            if j == _SELF_J:
                                cg = jnp.where(seye, 0.0, cg)
                            wd = w * inv_denom
                            if int_pow:
                                acc = wd
                                for _ in range(int(e_p) - 1):
                                    acc = acc * wd
                                corr = -k_p * acc
                            else:
                                corr = -k_p * jnp.power(wd, e_p)
                            a = lamc + ln + corr
                            b = a * cg
                            mask_ns = pm * (d2 <= h2)
                            if j == _SELF_J:
                                mask_ns = jnp.where(seye, 0.0, mask_ns)
                            # stacked MXU row-sums (see _phase1_kernel)
                            stack = jnp.concatenate(
                                [b, corr * mask_ns, mask_ns], axis=0)
                            ones_col = jnp.ones((m, 1), jnp.float32)
                            rhs = jnp.concatenate(
                                [ones_col, xs.T], axis=1)        # (M, 4)
                            rs = lax.dot_general(
                                stack, rhs, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (3S, 4)
                            S = STRIP
                            ds_ref[ci, sl] += (rs[0:S, 0:1] * xc
                                               - rs[0:S, 1:4])
                            cr_ref[ci, sl] += rs[S:2 * S, 0:1]
                            nsr_ref[ci, sl] += rs[2 * S:3 * S, 0:1]


def _gathers(grid: DenseGrid):
    """Neighbor blocks pre-gathered in XLA (streamed once per projection;
    ~0.4 ms at C=2048, M=128 — negligible vs keeping (C, M, M) off HBM)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt = grid.bmask.sum(-1).astype(jnp.int32)             # (C+1,)
    # FLAT (C*27,) — a 2-D scalar-prefetch operand is lane-padded to
    # (C, 128) in SMEM and blows the 1 MB budget at C=2048
    ncnt = cnt[grid.nbr].reshape(-1)                       # (C*27,)
    xnT = grid.bxyz.transpose(0, 2, 1)                     # (C+1, 3, M)
    xng = xnT[grid.nbr].reshape(c, 81, m)                  # (C, 27*3, M)
    mng = grid.bmask[grid.nbr].astype(jnp.float32)         # (C, 27, M)
    return cnt, ncnt, xng, mng


def _pad_c(arrs, c):
    cp = -(-c // CPB) * CPB
    if cp == c:
        return arrs, c
    return [jnp.pad(a, [(0, cp - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
            for a in arrs], cp


@functools.partial(jax.jit, static_argnames=("h", "eps", "c6", "s45"))
def phase1_slots(grid: DenseGrid, h, eps, c6, s45, gathered=None):
    """Per-slot density/gradient sums: (pi_raw, sg, c2d2, nlen, s_p6, s_edges).

    ``gathered`` optionally reuses a ``_gathers(grid)`` result (the two
    phases of one projection share it — saves ~5 ms/projection)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, xng, mng = _gathers(grid) if gathered is None else gathered
    xc = grid.bxyz[:-1]
    mc = grid.bmask[:-1].astype(jnp.float32)[..., None]
    (xc, mc, xng, mng), cp = _pad_c([xc, mc, xng, mng], c)
    cnt = jnp.pad(cnt[:-1], (0, cp - c))
    ncnt = jnp.pad(ncnt, (0, (cp - c) * 27))
    g = cp // CPB
    kern = functools.partial(_phase1_kernel, float(h), float(eps), float(c6),
                             float(s45), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), blk(81, m), blk(27, m)],
            out_specs=(blk(m, 1), blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt, ncnt, xc, mc, xng, mng)
    pi, sg, c2d2, nlen = out
    return (pi[:c, :, 0], sg[:c], c2d2[:c, :, 0], nlen[:c, :, 0],
            jnp.sum(pi), jnp.sum(nlen))


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "k_p", "e_p",
                                   "inv_denom"))
def phase2_slots(grid: DenseGrid, lam_s, h, eps, c6, s45, k_p, e_p, inv_denom,
                 gathered=None):
    """Per-slot delta sums: (dsum (C,M,3), s_corr, s_ns). lam_s: (C, M)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, xng, mng = _gathers(grid) if gathered is None else gathered
    lam_pad = jnp.concatenate([lam_s, jnp.zeros((1, m), jnp.float32)], 0)
    lng = lam_pad[grid.nbr]                                # (C, 27, M)
    xc = grid.bxyz[:-1]
    mc = grid.bmask[:-1].astype(jnp.float32)[..., None]
    lamc = lam_s[..., None]
    (xc, mc, lamc, xng, mng, lng), cp = _pad_c(
        [xc, mc, lamc, xng, mng, lng], c)
    cnt = jnp.pad(cnt[:-1], (0, cp - c))
    ncnt = jnp.pad(ncnt, (0, (cp - c) * 27))
    g = cp // CPB
    kern = functools.partial(_phase2_kernel, float(h), float(eps), float(c6),
                             float(s45), float(k_p), float(e_p),
                             float(inv_denom), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), blk(m, 1), blk(81, m), blk(27, m),
                      blk(27, m)],
            out_specs=(blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt, ncnt, xc, mc, lamc, xng, mng, lng)
    ds, cr, nsr = out
    return ds[:c], jnp.sum(cr), jnp.sum(nsr)
