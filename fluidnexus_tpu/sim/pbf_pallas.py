"""Fused Pallas pair-block kernels for the dense PBF projection.

The XLA formulation in sim/pbf_dense.py materializes every (C, M, M) pair
tensor in HBM (device-profiled: ~59 ms/projection at the 28k bench workload,
~40 GB of block-tensor traffic). These kernels keep each (M, M) block in
VMEM: per cell, the 27 neighbor-offset blocks are unrolled in-kernel with
compile-time shifts, pair distances come from one (M, 3) @ (3, M) MXU
matmul in cell-relative coordinates, and only the per-slot reductions
(pi, spiky sums, deltas — (M, 1)/(M, 3)) ever leave the core.

Empty cells and empty neighbor blocks are SKIPPED at run time via
scalar-prefetched slot counts (`@pl.when`), so compute scales with occupied
cells, not the static `max_cells` cap — data-dependent sparsity XLA cannot
express.

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
                   pi_ref, sg_ref, c2_ref, nl_ref, sp6_ref, sedg_ref):
    h2 = h * h
    pid = pl.program_id(0)
    eye = (lax.broadcasted_iota(jnp.int32, (m, m), 0)
           == lax.broadcasted_iota(jnp.int32, (m, m), 1))
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
    sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
    c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
    nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)

    # the (1,1) scalar sums map every program to the same block, which
    # persists across the sequential grid — zero once, accumulate after
    @pl.when(pid == 0)
    def _():
        sp6_ref[...] = jnp.zeros(sp6_ref.shape, sp6_ref.dtype)
        sedg_ref[...] = jnp.zeros(sedg_ref.shape, sedg_ref.dtype)

    for ci in range(CPB):
        cell = pid * CPB + ci
        xc = xc_ref[ci]                                    # (M, 3)
        mcf = mc_ref[ci]                                   # (M, 1)
        xc2 = jnp.sum(xc * xc, axis=1, keepdims=True)      # (M, 1)

        @pl.when(cnt_ref[cell] > 0)
        def _():
            for j in range(27):
                shift = _shift31(j, h)

                @pl.when(ncnt_ref[cell * 27 + j] > 0)
                def _():
                    xs = xng_ref[ci, 3 * j:3 * j + 3] + shift          # (3, M)
                    mn = mng_ref[ci, j].reshape(1, m)
                    cross = lax.dot_general(
                        xc, xs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)             # (M, M)
                    xn2 = jnp.sum(xs * xs, axis=0, keepdims=True)       # (1, M)
                    d2 = jnp.maximum(xc2 + xn2 - 2.0 * cross, 0.0)
                    if j == _SELF_J:
                        d2 = jnp.where(eye, 0.0, d2)
                    pm = mcf * mn
                    t2 = h2 - d2
                    w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0) * pm
                    inv = lax.rsqrt(d2 + eps)
                    rlen = (d2 + eps) * inv
                    hr = h - rlen
                    cg = jnp.where(rlen < h, (-s45) * hr * hr * inv, 0.0) * pm
                    if j == _SELF_J:
                        cg = jnp.where(eye, 0.0, cg)
                    inl = pm * (d2 <= h2)
                    pi_ref[ci] += jnp.sum(w, axis=1, keepdims=True)
                    sg_ref[ci] += (jnp.sum(cg, axis=1, keepdims=True) * xc
                                   - lax.dot_general(
                                       cg, xs, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST))
                    c2_ref[ci] += jnp.sum(cg * cg * d2, axis=1, keepdims=True)
                    nl_ref[ci] += jnp.sum(inl, axis=1, keepdims=True)
                    sp6_ref[...] += jnp.sum(w, axis=(0, 1), keepdims=True)
                    sedg_ref[...] += jnp.sum(inl, axis=(0, 1), keepdims=True)


def _phase2_kernel(h, eps, c6, s45, k_p, e_p, inv_denom, m, cnt_ref, ncnt_ref,
                   xc_ref, mc_ref, lamc_ref, xng_ref, mng_ref, lng_ref,
                   ds_ref, scorr_ref, sns_ref):
    h2 = h * h
    pid = pl.program_id(0)
    eye = (lax.broadcasted_iota(jnp.int32, (m, m), 0)
           == lax.broadcasted_iota(jnp.int32, (m, m), 1))
    ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)

    @pl.when(pid == 0)
    def _():
        scorr_ref[...] = jnp.zeros(scorr_ref.shape, scorr_ref.dtype)
        sns_ref[...] = jnp.zeros(sns_ref.shape, sns_ref.dtype)
    int_pow = float(e_p).is_integer() and 0 < int(e_p) <= 8

    for ci in range(CPB):
        cell = pid * CPB + ci
        xc = xc_ref[ci]
        mcf = mc_ref[ci]
        lamc = lamc_ref[ci]                                # (M, 1)
        xc2 = jnp.sum(xc * xc, axis=1, keepdims=True)

        @pl.when(cnt_ref[cell] > 0)
        def _():
            for j in range(27):
                shift = _shift31(j, h)

                @pl.when(ncnt_ref[cell * 27 + j] > 0)
                def _():
                    xs = xng_ref[ci, 3 * j:3 * j + 3] + shift
                    mn = mng_ref[ci, j].reshape(1, m)
                    ln = lng_ref[ci, j].reshape(1, m)
                    cross = lax.dot_general(
                        xc, xs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
                    xn2 = jnp.sum(xs * xs, axis=0, keepdims=True)
                    d2 = jnp.maximum(xc2 + xn2 - 2.0 * cross, 0.0)
                    if j == _SELF_J:
                        d2 = jnp.where(eye, 0.0, d2)
                    pm = mcf * mn
                    t2 = h2 - d2
                    w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0) * pm
                    if j == _SELF_J:
                        w = jnp.where(eye, 0.0, w)
                    inv = lax.rsqrt(d2 + eps)
                    rlen = (d2 + eps) * inv
                    hr = h - rlen
                    cg = jnp.where(rlen < h, (-s45) * hr * hr * inv, 0.0) * pm
                    if j == _SELF_J:
                        cg = jnp.where(eye, 0.0, cg)
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
                    ds_ref[ci] += (jnp.sum(b, axis=1, keepdims=True) * xc
                                   - lax.dot_general(
                                       b, xs, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST))
                    mask_ns = pm * (d2 <= h2)
                    if j == _SELF_J:
                        mask_ns = jnp.where(eye, 0.0, mask_ns)
                    scorr_ref[...] += jnp.sum(corr * mask_ns, axis=(0, 1), keepdims=True)
                    sns_ref[...] += jnp.sum(mask_ns, axis=(0, 1), keepdims=True)


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
def phase1_slots(grid: DenseGrid, h, eps, c6, s45):
    """Per-slot density/gradient sums: (pi_raw, sg, c2d2, nlen, s_p6, s_edges)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, xng, mng = _gathers(grid)
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
    sblk = pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), blk(81, m), blk(27, m)],
            out_specs=(blk(m, 1), blk(m, 3), blk(m, 1), blk(m, 1), sblk, sblk),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt, ncnt, xc, mc, xng, mng)
    pi, sg, c2d2, nlen, sp6, sedg = out
    return (pi[:c, :, 0], sg[:c], c2d2[:c, :, 0], nlen[:c, :, 0],
            sp6[0, 0], sedg[0, 0])


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "k_p", "e_p",
                                   "inv_denom"))
def phase2_slots(grid: DenseGrid, lam_s, h, eps, c6, s45, k_p, e_p, inv_denom):
    """Per-slot delta sums: (dsum (C,M,3), s_corr, s_ns). lam_s: (C, M)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, ncnt, xng, mng = _gathers(grid)
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
    sblk = pl.BlockSpec((1, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), blk(m, 1), blk(81, m), blk(27, m),
                      blk(27, m)],
            out_specs=(blk(m, 3), sblk, sblk),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt, ncnt, xc, mc, lamc, xng, mng, lng)
    ds, scorr, sns = out
    return ds[:c], scorr[0, 0], sns[0, 0]
