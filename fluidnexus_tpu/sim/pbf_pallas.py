"""Fused Pallas pair-block kernels for the dense PBF projection.

The XLA formulation in sim/pbf_dense.py materializes every (C, M, M) pair
tensor in HBM (device-profiled: ~100 ms/projection at exact f32 at the 28k
bench workload, ~40 GB of block-tensor traffic). These kernels keep each
(M, M) block in VMEM: per cell, the 27 neighbor-offset blocks are unrolled
in-kernel with compile-time shifts, and only per-slot reductions
((M, 1)/(M, 3)) ever leave the core.

In-kernel unit assignment (all device-measured — see the r3 status doc):
- pair distances: direct subtract-square on the VPU (exact f32; the
  |xi|^2+|xj|^2-2xi.xj MXU route needs 6-pass HIGHEST matmuls — Mosaic has
  no 3-pass tier — and benched no faster),
- scalar row reductions: plain VPU jnp.sum(axis=1); the stacked
  [w|cg|...] @ [ones|xs^T] MXU alternative benched ~2x slower (see
  MXU_ROWSUM below). Only the (S,M)@(M,3) vector sums ride the MXU.
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnexus_tpu.ops.neighbors import _OFFSETS, DenseGrid

CPB = 8           # cells per program (VMEM budget allows 8 at M=128)
STRIP = 64        # center-row strip: strips past ceil(cnt/STRIP) are skipped
                  # (slots are front-compacted per cell — neighbors.py slotv),
                  # so pair work scales with live rows, not the static M cap.
                  # Device A/B at the 28k bench workload (VPU row-sum era,
                  # mean fill 43/128): STRIP=64 wins ~19% on both phases
                  # (phase1 27.1 -> 22.1 ms, phase2 27.5 -> 22.2); STRIP=32
                  # regresses phase1 to 36.4 ms (branch overhead). The earlier
                  # "neutral-to-worse" result was measured with the MXU
                  # stacked row-sums dominating the per-strip cost.
                  # NOTE: dead slots on processed strips contribute their
                  # self-pair to the RAW per-slot outputs, so raw dead-slot
                  # values are STRIP-dependent; live slots and the corrected
                  # global sums are not (dead slots are never gathered back
                  # to point space).
_SELF_J = 13      # index of the (0,0,0) offset in _OFFSETS


def _interpret():
    return jax.default_backend() != "tpu"


def _shift31(j, h):
    """(3, 1) offset*h column built from scalars (pallas forbids captured
    array constants)."""
    sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
    ri = lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    return jnp.where(ri == 0, sx, jnp.where(ri == 1, sy, sz))


MXU_ROWSUM = False  # stacked [w|cg|...] @ [ones|xs^T] row-sums vs plain VPU
                    # jnp.sum(axis=1). The MXU form was committed unmeasured
                    # during the r3 TPU outage and device-benched ~2x SLOWER
                    # at the 28k bench workload (phase1 55.8 vs 26.8 ms,
                    # phase2 44.1 vs 27.4 ms; outputs agree to 4e-5 rel): the
                    # (4S,M)@(M,4) stacked matmul fills 4 of 128 result lanes
                    # and its two sublane concatenates per block-offset are
                    # retiling copies — costlier than the VPU shuffle-tree
                    # sums they replace. Only the (S,M)@(M,3) vector sums
                    # stay on the MXU.


def _phase1_kernel(h, eps, c6, s45, m, mxu, cnt_ref, ncnt_ref,
                   xc_ref, xng_ref,
                   pi_ref, sg_ref, c2_ref, nl_ref):
    h2 = h * h
    pid = pl.program_id(0)
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
    sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
    c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
    nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)
    # no mask loads/multiplies anywhere: dead slots carry far-away sentinel
    # coords (see _gathers) so d2 > h^2 excludes them; global sums
    # (s_p6, s_edges) are corrected for the dead self-diagonal in XLA

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            for j in range(27):
                shift = _shift31(j, h)

                @pl.when(ncnt_ref[cell * 27 + j] > 0)
                def _():
                    xs = xng_ref[ci, 3 * j:3 * j + 3] + shift          # (3, M)
                    S = min(STRIP, m)
                    for s in range(m // S):
                        sl = slice(s * S, (s + 1) * S)

                        @pl.when(cnt_ref[cell] > s * S)
                        def _():
                            xc = xc_ref[ci, sl]                # (S, 3)
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
                                    jnp.int32, (S, m), 0) + s * S
                                    == lax.broadcasted_iota(
                                        jnp.int32, (S, m), 1))
                                d2 = jnp.where(seye, 0.0, d2)
                            t2 = h2 - d2
                            w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
                            inv = lax.rsqrt(d2 + eps)
                            rlen = (d2 + eps) * inv
                            hr = h - rlen
                            cg = jnp.where(rlen < h,
                                           (-s45) * hr * hr * inv, 0.0)
                            if j == _SELF_J:
                                cg = jnp.where(seye, 0.0, cg)
                            inl = (d2 <= h2).astype(jnp.float32)
                            if mxu:
                                # ALL row-sums as one stacked (4S, M) @ (M, 4)
                                # against [ones | xs^T] — see MXU_ROWSUM
                                stack = jnp.concatenate(
                                    [w, cg, cg * cg * d2, inl], axis=0)
                                ones_col = jnp.ones((m, 1), jnp.float32)
                                rhs = jnp.concatenate(
                                    [ones_col, xs.T], axis=1)        # (M, 4)
                                rs = lax.dot_general(
                                    stack, rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)  # (4S, 4)
                                pi_ref[ci, sl] += rs[0:S, 0:1]
                                sg_ref[ci, sl] += (rs[S:2 * S, 0:1] * xc
                                                   - rs[S:2 * S, 1:4])
                                c2_ref[ci, sl] += rs[2 * S:3 * S, 0:1]
                                nl_ref[ci, sl] += rs[3 * S:4 * S, 0:1]
                            else:
                                rs_cg = jnp.sum(cg, axis=1, keepdims=True)
                                wxs = lax.dot_general(
                                    cg, xs.T, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)  # (S, 3)
                                pi_ref[ci, sl] += jnp.sum(w, axis=1,
                                                          keepdims=True)
                                sg_ref[ci, sl] += rs_cg * xc - wxs
                                c2_ref[ci, sl] += jnp.sum(cg * cg * d2, axis=1,
                                                          keepdims=True)
                                nl_ref[ci, sl] += jnp.sum(inl, axis=1,
                                                          keepdims=True)


def _phase2_kernel(h, eps, c6, s45, k_p, e_p, inv_denom, m, mxu,
                   cnt_ref, ncnt_ref,
                   xc_ref, lamc_ref, xng_ref, lng_ref,
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
                    ln = lng_ref[ci, j].reshape(1, m)
                    S = min(STRIP, m)
                    for s in range(m // S):
                        sl = slice(s * S, (s + 1) * S)

                        @pl.when(cnt_ref[cell] > s * S)
                        def _():
                            xc = xc_ref[ci, sl]
                            lamc = lamc_ref[ci, sl]        # (S, 1)
                            # VPU subtract-square d2 — see _phase1_kernel
                            dx0 = xc[:, 0:1] - xs[0:1, :]
                            dx1 = xc[:, 1:2] - xs[1:2, :]
                            dx2 = xc[:, 2:3] - xs[2:3, :]
                            d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                            if j == _SELF_J:
                                seye = (lax.broadcasted_iota(
                                    jnp.int32, (S, m), 0) + s * S
                                    == lax.broadcasted_iota(
                                        jnp.int32, (S, m), 1))
                                d2 = jnp.where(seye, 0.0, d2)
                            t2 = h2 - d2
                            w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
                            if j == _SELF_J:
                                w = jnp.where(seye, 0.0, w)
                            inv = lax.rsqrt(d2 + eps)
                            rlen = (d2 + eps) * inv
                            hr = h - rlen
                            cg = jnp.where(rlen < h,
                                           (-s45) * hr * hr * inv, 0.0)
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
                            mask_ns = (d2 <= h2).astype(jnp.float32)
                            if j == _SELF_J:
                                mask_ns = jnp.where(seye, 0.0, mask_ns)
                            if mxu:
                                # stacked MXU row-sums (see MXU_ROWSUM)
                                stack = jnp.concatenate(
                                    [b, corr * mask_ns, mask_ns], axis=0)
                                ones_col = jnp.ones((m, 1), jnp.float32)
                                rhs = jnp.concatenate(
                                    [ones_col, xs.T], axis=1)        # (M, 4)
                                rs = lax.dot_general(
                                    stack, rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)  # (3S, 4)
                                ds_ref[ci, sl] += (rs[0:S, 0:1] * xc
                                                   - rs[0:S, 1:4])
                                cr_ref[ci, sl] += rs[S:2 * S, 0:1]
                                nsr_ref[ci, sl] += rs[2 * S:3 * S, 0:1]
                            else:
                                rs_b = jnp.sum(b, axis=1, keepdims=True)
                                bxs = lax.dot_general(
                                    b, xs.T, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)  # (S, 3)
                                ds_ref[ci, sl] += rs_b * xc - bxs
                                cr_ref[ci, sl] += jnp.sum(corr * mask_ns,
                                                          axis=1, keepdims=True)
                                nsr_ref[ci, sl] += jnp.sum(mask_ns, axis=1,
                                                           keepdims=True)


_SENT_SCALE = 100.0   # dead-slot coordinate spacing (see _gathers)


def _gathers(grid: DenseGrid):
    """Neighbor blocks pre-gathered in XLA (streamed once per projection).

    MASK-FREE pair exclusion: dead slots get a unique far-away sentinel
    coordinate ``(cell*M + slot) * _SENT_SCALE`` on every axis, so any pair
    involving a dead slot has ``d2 > h^2`` and drops out of the kernel math
    with NO mask loads or multiplies. The single exception is a dead slot
    paired with ITSELF on the self-offset diagonal (d2 = 0 exactly): its
    poly6/in-list contribution is excluded per-row where it matters (the
    spiky diagonal is already eye-masked) and corrected as a closed-form
    scalar in phase1_slots for the two global sums.
    """
    c, m = grid.nbr.shape[0], grid.capacity
    cnt = grid.bmask.sum(-1).astype(jnp.int32)             # (C+1,)
    # FLAT (C*27,) — a 2-D scalar-prefetch operand is lane-padded to
    # (C, 128) in SMEM and blows the 1 MB budget at C=2048
    ncnt = cnt[grid.nbr].reshape(-1)                       # (C*27,)
    rows = jnp.arange(c + 1, dtype=jnp.int32)[:, None] * m
    sent = ((rows + jnp.arange(m, dtype=jnp.int32)[None, :])
            .astype(jnp.float32) * _SENT_SCALE)[..., None]  # (C+1, M, 1)
    bs = jnp.where(grid.bmask[..., None], grid.bxyz, sent)  # (C+1, M, 3)
    xnT = bs.transpose(0, 2, 1)                             # (C+1, 3, M)
    xng = xnT[grid.nbr].reshape(c, 81, m)                   # (C, 27*3, M)
    return cnt, ncnt, bs, xng


def _pad_c(arrs, c):
    cp = -(-c // CPB) * CPB
    if cp == c:
        return arrs, c
    return [jnp.pad(a, [(0, cp - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
            for a in arrs], cp


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "mxu_rowsum"))
def phase1_slots(grid: DenseGrid, h, eps, c6, s45, gathered=None,
                 mxu_rowsum=None):
    """Per-slot density/gradient sums: (pi_raw, sg, c2d2, nlen, s_p6, s_edges).

    ``gathered`` optionally reuses a ``_gathers(grid)`` result (the two
    phases of one projection share it — saves ~5 ms/projection)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, bs, xng = _gathers(grid) if gathered is None else gathered
    xc = bs[:-1]
    (xc, xng), cp = _pad_c([xc, xng], c)
    cntc = cnt[:-1]
    cnt_p = jnp.pad(cntc, (0, cp - c))
    ncnt = jnp.pad(ncnt, (0, (cp - c) * 27))
    g = cp // CPB
    mxu = MXU_ROWSUM if mxu_rowsum is None else mxu_rowsum
    kern = functools.partial(_phase1_kernel, float(h), float(eps), float(c6),
                             float(s45), m, mxu)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(81, m)],
            out_specs=(blk(m, 1), blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt_p, ncnt, xc, xng)
    pi, sg, c2d2, nlen = out
    # dead self-diagonal correction: every dead slot of an occupied center
    # cell whose row strip was processed contributes exactly one (d2=0)
    # self pair: w = c6*h^6, inl = 1
    s_eff = min(STRIP, m)
    rows_done = jnp.minimum(-(-cntc // s_eff) * s_eff, m)
    n_dead = jnp.sum(jnp.where(cntc > 0, rows_done - cntc, 0)
                     ).astype(jnp.float32)
    w_self = float(c6) * float(h) ** 6
    return (pi[:c, :, 0], sg[:c], c2d2[:c, :, 0], nlen[:c, :, 0],
            jnp.sum(pi) - n_dead * w_self, jnp.sum(nlen) - n_dead)


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "k_p", "e_p",
                                   "inv_denom", "mxu_rowsum"))
def phase2_slots(grid: DenseGrid, lam_s, h, eps, c6, s45, k_p, e_p, inv_denom,
                 gathered=None, mxu_rowsum=None):
    """Per-slot delta sums: (dsum (C,M,3), s_corr, s_ns). lam_s: (C, M)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, bs, xng = _gathers(grid) if gathered is None else gathered
    lam_pad = jnp.concatenate([lam_s, jnp.zeros((1, m), jnp.float32)], 0)
    lng = lam_pad[grid.nbr]                                # (C, 27, M)
    xc = bs[:-1]
    lamc = lam_s[..., None]
    (xc, lamc, xng, lng), cp = _pad_c([xc, lamc, xng, lng], c)
    cnt = jnp.pad(cnt[:-1], (0, cp - c))
    ncnt = jnp.pad(ncnt, (0, (cp - c) * 27))
    g = cp // CPB
    mxu = MXU_ROWSUM if mxu_rowsum is None else mxu_rowsum
    kern = functools.partial(_phase2_kernel, float(h), float(eps), float(c6),
                             float(s45), float(k_p), float(e_p),
                             float(inv_denom), m, mxu)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), blk(81, m), blk(27, m)],
            out_specs=(blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt, ncnt, xc, lamc, xng, lng)
    ds, cr, nsr = out
    return ds[:c], jnp.sum(cr), jnp.sum(nsr)
