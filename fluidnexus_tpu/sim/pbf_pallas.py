"""Fused Pallas pair-block kernels for the dense PBF projection.

The XLA formulation in sim/pbf_dense.py materializes every (C, M, M) pair
tensor in HBM (device-profiled: ~100 ms/projection at exact f32 at the 28k
bench workload, ~40 GB of block-tensor traffic). These kernels keep each
(S, M) pair strip in VMEM and only per-slot reductions ((M, 1)/(M, 3)) ever
leave the core.

Kernel structure (r4, re-derived from a device ablation — tools/
bench_pbf_ablate.py at the 28k bench workload, 576 occupied cells,
mean fill 48/128):

- An ablated "floor" kernel (all control flow, no math) measured 20.8 of the
  34.3 ms phase cost: the ~40k fine-grained ``@pl.when`` regions
  (per-(cell,offset) skip + per-(cell,offset,strip) skip) cost ~0.4 us EACH
  on the scalar core. The r3 design optimized exactly the wrong thing.
- So: the 27-offset loop runs UNCONDITIONALLY (dead neighbor blocks are
  numerically inert — their slots carry far-away sentinel coordinates, see
  ``_gathers``), and the row-strip loop is hoisted ABOVE the offset loop.
  Predicated regions per phase drop from ~40k to ~1.7k (one live-cell check
  plus one per-strip check per cell).
- Per-offset cross-lane reductions are gone: each strip accumulates
  PER-LANE partials across the 27 offsets in VMEM registers (w, cg, cg^2*d2,
  in-list, and the three cg*xj products) and runs ONE cross-lane tree per
  quantity at strip end — 27x fewer reduction trees.
- The per-offset (S, M) @ (M, 3) MXU dots are gone too: an ablation with
  extra per-offset dots measured ~0.57 us per small HIGHEST dot, so the
  vector sum sum_j cg_ij * xj is computed as three VPU multiplies folded
  into the per-lane accumulators instead.

In-kernel unit assignment (device-measured):
- pair distances: direct subtract-square on the VPU (exact f32; the
  |xi|^2+|xj|^2-2xi.xj MXU route needs 6-pass HIGHEST matmuls — Mosaic has
  no 3-pass tier — and benched no faster),
- all reductions: per-lane VPU accumulation + one tree per strip (the r3
  stacked-MXU row-sum form benched ~2x slower than even the per-offset VPU
  trees; a 4-dot per-offset variant benched 55 vs 34 ms),
- global diagnostics (s_p6, s_edges, s_corr, s_ns): recovered in XLA from
  the zeroed per-row outputs instead of (1,1) in-kernel accumulators.

v2 kernels (current default): the v1 kernels consumed an XLA-pre-gathered
(C, 81, M) neighbor-coordinate tensor; the device trace
(tools/xplane_summary.py) pinned that gather at ~8.7 ms + a ~4.8 ms layout
copy per projection — 55k small row-DMAs, latency-bound, HALF the projection
cost. The whole (C+1, M) coordinate table is only ~3 MB, so the v2 kernels
(``phase1_slots_v2`` / ``phase2_slots_v2``) keep the three per-component
coordinate planes (and phase-2's lambda plane) RESIDENT IN VMEM and read
neighbor rows with in-kernel dynamic loads indexed by the scalar-prefetched
compacted ``nbr`` table (flattened 1-D: SMEM pads a 2-D minor dim to the
128-lane width, which blows the 1 MB SMEM budget). Device A/B at the 28k
bench workload: 34.3 -> 14.4 ms/projection, bit-identical outputs.

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


def _pair_wcg(h, eps, c6, s45, xc, xs, j, s0, S, m):
    """Shared per-offset pair math: (d2, w, cg) for one (S, m) strip.

    Self-offset rows are eye-masked for cg (the reference's rlen > 0 spiky
    guard); d2 is forced to exactly 0 on the diagonal (it already is —
    identical coords subtract to 0 — the where is belt and braces)."""
    dx0 = xc[:, 0:1] - xs[0:1, :]
    dx1 = xc[:, 1:2] - xs[1:2, :]
    dx2 = xc[:, 2:3] - xs[2:3, :]
    d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
    seye = None
    if j == _SELF_J:
        seye = (lax.broadcasted_iota(jnp.int32, (S, m), 0) + s0
                == lax.broadcasted_iota(jnp.int32, (S, m), 1))
        d2 = jnp.where(seye, 0.0, d2)
    h2 = h * h
    t2 = h2 - d2
    w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
    inv = lax.rsqrt(d2 + eps)
    rlen = (d2 + eps) * inv
    hr = h - rlen
    cg = jnp.where(rlen < h, (-s45) * hr * hr * inv, 0.0)
    if j == _SELF_J:
        cg = jnp.where(seye, 0.0, cg)
    return d2, w, cg, seye


def _phase1_kernel(h, eps, c6, s45, m, cnt_ref,
                   xc_ref, xng_ref,
                   pi_ref, sg_ref, c2_ref, nl_ref):
    pid = pl.program_id(0)
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
    sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
    c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
    nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)
    h2 = h * h

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]                        # (S, 3)
                    z = jnp.zeros((S, m), jnp.float32)
                    wa, cga, c2a, nla = z, z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        xs = xng_ref[ci, 3 * j:3 * j + 3] + _shift31(j, h)
                        d2, w, cg, _ = _pair_wcg(h, eps, c6, s45, xc, xs,
                                                 j, s * S, S, m)
                        wa = wa + w
                        cga = cga + cg
                        c2a = c2a + cg * cg * d2
                        nla = nla + (d2 <= h2).astype(jnp.float32)
                        bx0 = bx0 + cg * xs[0:1, :]
                        bx1 = bx1 + cg * xs[1:2, :]
                        bx2 = bx2 + cg * xs[2:3, :]
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    pi_ref[ci, sl] += rs(wa)
                    sg_ref[ci, sl] += rs(cga) * xc - jnp.concatenate(
                        [rs(bx0), rs(bx1), rs(bx2)], axis=1)
                    c2_ref[ci, sl] += rs(c2a)
                    nl_ref[ci, sl] += rs(nla)

                if s == 0:
                    strip()        # cnt > 0 already holds
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _phase2_kernel(h, eps, c6, s45, k_p, e_p, inv_denom, m, cnt_ref,
                   xc_ref, lamc_ref, xng_ref, lng_ref,
                   ds_ref, cr_ref, nsr_ref):
    pid = pl.program_id(0)
    ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)
    cr_ref[...] = jnp.zeros(cr_ref.shape, cr_ref.dtype)
    nsr_ref[...] = jnp.zeros(nsr_ref.shape, nsr_ref.dtype)
    h2 = h * h
    int_pow = float(e_p).is_integer() and 0 < int(e_p) <= 8

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]
                    lamc = lamc_ref[ci, sl]                    # (S, 1)
                    z = jnp.zeros((S, m), jnp.float32)
                    ba, cra, nsa = z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        xs = xng_ref[ci, 3 * j:3 * j + 3] + _shift31(j, h)
                        ln = lng_ref[ci, j].reshape(1, m)
                        d2, w, cg, seye = _pair_wcg(h, eps, c6, s45, xc, xs,
                                                    j, s * S, S, m)
                        if j == _SELF_J:
                            w = jnp.where(seye, 0.0, w)
                        wd = w * inv_denom
                        if int_pow:
                            acc = wd
                            for _ in range(int(e_p) - 1):
                                acc = acc * wd
                            corr = -k_p * acc
                        else:
                            corr = -k_p * jnp.power(wd, e_p)
                        b = (lamc + ln + corr) * cg
                        mask_ns = (d2 <= h2).astype(jnp.float32)
                        if j == _SELF_J:
                            mask_ns = jnp.where(seye, 0.0, mask_ns)
                        ba = ba + b
                        cra = cra + corr * mask_ns
                        nsa = nsa + mask_ns
                        bx0 = bx0 + b * xs[0:1, :]
                        bx1 = bx1 + b * xs[1:2, :]
                        bx2 = bx2 + b * xs[2:3, :]
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    ds_ref[ci, sl] += rs(ba) * xc - jnp.concatenate(
                        [rs(bx0), rs(bx1), rs(bx2)], axis=1)
                    cr_ref[ci, sl] += rs(cra)
                    nsr_ref[ci, sl] += rs(nsa)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _pair_wcg_rows(h, eps, c6, s45, xc, xsx, xsy, xsz, j, s0, S, m):
    """_pair_wcg with the neighbor row held as three (1, m) component rows
    (VMEM-resident-plane kernels) instead of one (3, m) block."""
    dx0 = xc[:, 0:1] - xsx
    dx1 = xc[:, 1:2] - xsy
    dx2 = xc[:, 2:3] - xsz
    d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
    seye = None
    if j == _SELF_J:
        seye = (lax.broadcasted_iota(jnp.int32, (S, m), 0) + s0
                == lax.broadcasted_iota(jnp.int32, (S, m), 1))
        d2 = jnp.where(seye, 0.0, d2)
    h2 = h * h
    t2 = h2 - d2
    w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
    inv = lax.rsqrt(d2 + eps)
    rlen = (d2 + eps) * inv
    hr = h - rlen
    cg = jnp.where(rlen < h, (-s45) * hr * hr * inv, 0.0)
    if j == _SELF_J:
        cg = jnp.where(seye, 0.0, cg)
    return d2, w, cg, seye


def _phase1_kernel_v2(h, eps, c6, s45, m, cnt_ref, nbr_ref,
                      xc_ref, xp_ref, yp_ref, zp_ref,
                      pi_ref, sg_ref, c2_ref, nl_ref):
    """Phase-1 with the WHOLE (C+1, M) coordinate planes resident in VMEM:
    neighbor rows are in-kernel dynamic loads indexed by the scalar-prefetched
    ``nbr`` table. Replaces the v1 (C, 81, M) XLA pre-gather, which the device
    trace pinned at ~8.7 ms gather + ~4.8 ms layout copy per projection
    (55k row-DMAs, latency-bound) — the planes total ~3 MB and are fetched
    once."""
    pid = pl.program_id(0)
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)
    sg_ref[...] = jnp.zeros(sg_ref.shape, sg_ref.dtype)
    c2_ref[...] = jnp.zeros(c2_ref.shape, c2_ref.dtype)
    nl_ref[...] = jnp.zeros(nl_ref.shape, nl_ref.dtype)
    h2 = h * h

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]                        # (S, 3)
                    z = jnp.zeros((S, m), jnp.float32)
                    wa, cga, c2a, nla = z, z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx     # (1, m)
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        d2, w, cg, _ = _pair_wcg_rows(
                            h, eps, c6, s45, xc, xsx, xsy, xsz, j, s * S, S, m)
                        wa = wa + w
                        cga = cga + cg
                        c2a = c2a + cg * cg * d2
                        nla = nla + (d2 <= h2).astype(jnp.float32)
                        bx0 = bx0 + cg * xsx
                        bx1 = bx1 + cg * xsy
                        bx2 = bx2 + cg * xsz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    pi_ref[ci, sl] += rs(wa)
                    sg_ref[ci, sl] += rs(cga) * xc - jnp.concatenate(
                        [rs(bx0), rs(bx1), rs(bx2)], axis=1)
                    c2_ref[ci, sl] += rs(c2a)
                    nl_ref[ci, sl] += rs(nla)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _phase2_kernel_v2(h, eps, c6, s45, k_p, e_p, inv_denom, m, cnt_ref, nbr_ref,
                      xc_ref, lamc_ref, xp_ref, yp_ref, zp_ref, lamp_ref,
                      ds_ref, cr_ref, nsr_ref):
    """Phase-2 twin of :func:`_phase1_kernel_v2`; the neighbor lambda row is a
    dynamic load from the VMEM-resident (C+1, M) lambda plane (replaces the
    v1 (C, 27, M) XLA lam gather)."""
    pid = pl.program_id(0)
    ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)
    cr_ref[...] = jnp.zeros(cr_ref.shape, cr_ref.dtype)
    nsr_ref[...] = jnp.zeros(nsr_ref.shape, nsr_ref.dtype)
    h2 = h * h
    int_pow = float(e_p).is_integer() and 0 < int(e_p) <= 8

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]
                    lamc = lamc_ref[ci, sl]                    # (S, 1)
                    z = jnp.zeros((S, m), jnp.float32)
                    ba, cra, nsa = z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        ln = lamp_ref[pl.ds(nb, 1), :]         # (1, m)
                        d2, w, cg, seye = _pair_wcg_rows(
                            h, eps, c6, s45, xc, xsx, xsy, xsz, j, s * S, S, m)
                        if j == _SELF_J:
                            w = jnp.where(seye, 0.0, w)
                        wd = w * inv_denom
                        if int_pow:
                            acc = wd
                            for _ in range(int(e_p) - 1):
                                acc = acc * wd
                            corr = -k_p * acc
                        else:
                            corr = -k_p * jnp.power(wd, e_p)
                        b = (lamc + ln + corr) * cg
                        mask_ns = (d2 <= h2).astype(jnp.float32)
                        if j == _SELF_J:
                            mask_ns = jnp.where(seye, 0.0, mask_ns)
                        ba = ba + b
                        cra = cra + corr * mask_ns
                        nsa = nsa + mask_ns
                        bx0 = bx0 + b * xsx
                        bx1 = bx1 + b * xsy
                        bx2 = bx2 + b * xsz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    ds_ref[ci, sl] += rs(ba) * xc - jnp.concatenate(
                        [rs(bx0), rs(bx1), rs(bx2)], axis=1)
                    cr_ref[ci, sl] += rs(cra)
                    nsr_ref[ci, sl] += rs(nsa)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


_SENT_SCALE = 100.0   # dead-slot coordinate spacing (see _gathers)


def _gathers(grid: DenseGrid):
    """Neighbor blocks pre-gathered in XLA (streamed once per projection).

    MASK-FREE pair exclusion: dead slots get a unique far-away sentinel
    coordinate ``(cell*M + slot) * _SENT_SCALE`` on every axis, so any pair
    involving a dead slot has ``d2 > h^2`` and drops out of the kernel math
    with NO mask loads or multiplies. This also makes EMPTY neighbor blocks
    numerically inert, so the kernels iterate all 27 offsets branch-free
    (the poly6 overflow on huge sentinel distances is killed by the select —
    inf picks the 0 branch). The single exception is a dead slot paired with
    ITSELF on the self-offset diagonal (d2 = 0 exactly): its poly6/in-list
    contribution is excluded per-row where it matters (the spiky diagonal is
    already eye-masked) and corrected as a closed-form scalar in
    phase1_slots for the two global sums.
    """
    c, m = grid.nbr.shape[0], grid.capacity
    cnt = grid.bmask.sum(-1).astype(jnp.int32)             # (C+1,)
    rows = jnp.arange(c + 1, dtype=jnp.int32)[:, None] * m
    sent = ((rows + jnp.arange(m, dtype=jnp.int32)[None, :])
            .astype(jnp.float32) * _SENT_SCALE)[..., None]  # (C+1, M, 1)
    bs = jnp.where(grid.bmask[..., None], grid.bxyz, sent)  # (C+1, M, 3)
    xnT = bs.transpose(0, 2, 1)                             # (C+1, 3, M)
    xng = xnT[grid.nbr].reshape(c, 81, m)                   # (C, 27*3, M)
    return cnt, bs, xng


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
    cnt, bs, xng = _gathers(grid) if gathered is None else gathered
    xc = bs[:-1]
    (xc, xng), cp = _pad_c([xc, xng], c)
    cntc = cnt[:-1]
    cnt_p = jnp.pad(cntc, (0, cp - c))
    g = cp // CPB
    kern = functools.partial(_phase1_kernel, float(h), float(eps), float(c6),
                             float(s45), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
    )(cnt_p, xc, xng)
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
                                   "inv_denom"))
def phase2_slots(grid: DenseGrid, lam_s, h, eps, c6, s45, k_p, e_p, inv_denom,
                 gathered=None):
    """Per-slot delta sums: (dsum (C,M,3), s_corr, s_ns). lam_s: (C, M)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, bs, xng = _gathers(grid) if gathered is None else gathered
    lam_pad = jnp.concatenate([lam_s, jnp.zeros((1, m), jnp.float32)], 0)
    lng = lam_pad[grid.nbr]                                # (C, 27, M)
    xc = bs[:-1]
    lamc = lam_s[..., None]
    (xc, lamc, xng, lng), cp = _pad_c([xc, lamc, xng, lng], c)
    cnt = jnp.pad(cnt[:-1], (0, cp - c))
    g = cp // CPB
    kern = functools.partial(_phase2_kernel, float(h), float(eps), float(c6),
                             float(s45), float(k_p), float(e_p),
                             float(inv_denom), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
    )(cnt, xc, lamc, xng, lng)
    ds, cr, nsr = out
    return ds[:c], jnp.sum(cr), jnp.sum(nsr)


def _planes(grid: DenseGrid, bxyz=None):
    """Sentinel-filled per-component coordinate planes (C+1, M) + counts —
    the VMEM-resident inputs of the v2 kernels. Same sentinel scheme as
    :func:`_gathers` (identical on all three components), so the dead-pair
    exclusion math and the closed-form dead-diagonal corrections carry over
    unchanged. ``bxyz`` overrides the stored coordinates (the slot-space
    tick in sim/pbf_dense.py refreshes coords per Jacobi iteration while
    reusing the cell assignment)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt = grid.bmask.sum(-1).astype(jnp.int32)             # (C+1,)
    rows = jnp.arange(c + 1, dtype=jnp.int32)[:, None] * m
    sent = ((rows + jnp.arange(m, dtype=jnp.int32)[None, :])
            .astype(jnp.float32) * _SENT_SCALE)            # (C+1, M)
    bs = jnp.where(grid.bmask[..., None],
                   grid.bxyz if bxyz is None else bxyz, sent[..., None])
    return cnt, bs, sent


def _plane_parts(grid, planes):
    cnt, bs, _ = planes
    # bs already carries the sentinels — the component planes are plain slices
    return cnt, bs, bs[..., 0], bs[..., 1], bs[..., 2]


def _full(shape):
    return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("h", "eps", "c6", "s45"))
def phase1_slots_v2(grid: DenseGrid, h, eps, c6, s45, planes=None):
    """v2 of :func:`phase1_slots`: no (C, 81, M) neighbor pre-gather — the
    coordinate planes stay resident in VMEM and the kernel indexes them by
    the scalar-prefetched compacted ``nbr`` table. Outputs identical."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, bs, xp, yp, zp = _plane_parts(grid, _planes(grid) if planes is None
                                       else planes)
    xc = bs[:-1]
    (xc,), cp = _pad_c([xc], c)
    cntc = cnt[:-1]
    cnt_p = jnp.pad(cntc, (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)  # 1-D: SMEM pads 2-D minor
    g = cp // CPB
    kern = functools.partial(_phase1_kernel_v2, float(h), float(eps), float(c6),
                             float(s45), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), _full((c + 1, m)), _full((c + 1, m)),
                      _full((c + 1, m))],
            out_specs=(blk(m, 1), blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xc, xp, yp, zp)
    pi, sg, c2d2, nlen = out
    s_eff = min(STRIP, m)
    rows_done = jnp.minimum(-(-cntc // s_eff) * s_eff, m)
    n_dead = jnp.sum(jnp.where(cntc > 0, rows_done - cntc, 0)
                     ).astype(jnp.float32)
    w_self = float(c6) * float(h) ** 6
    return (pi[:c, :, 0], sg[:c], c2d2[:c, :, 0], nlen[:c, :, 0],
            jnp.sum(pi) - n_dead * w_self, jnp.sum(nlen) - n_dead)


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "k_p", "e_p",
                                   "inv_denom"))
def phase2_slots_v2(grid: DenseGrid, lam_s, h, eps, c6, s45, k_p, e_p,
                    inv_denom, planes=None):
    """v2 of :func:`phase2_slots`: VMEM-resident coordinate + lambda planes
    with in-kernel neighbor reads (no (C, 27, M) lam gather)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, bs, xp, yp, zp = _plane_parts(grid, _planes(grid) if planes is None
                                       else planes)
    lam_pad = jnp.concatenate([lam_s, jnp.zeros((1, m), jnp.float32)], 0)
    xc = bs[:-1]
    lamc = lam_s[..., None]
    (xc, lamc), cp = _pad_c([xc, lamc], c)
    cnt_p = jnp.pad(cnt[:-1], (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)
    g = cp // CPB
    kern = functools.partial(_phase2_kernel_v2, float(h), float(eps), float(c6),
                             float(s45), float(k_p), float(e_p),
                             float(inv_denom), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), _full((c + 1, m)),
                      _full((c + 1, m)), _full((c + 1, m)), _full((c + 1, m))],
            out_specs=(blk(m, 3), blk(m, 1), blk(m, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xc, lamc, xp, yp, zp, lam_pad)
    ds, cr, nsr = out
    return ds[:c], jnp.sum(cr), jnp.sum(nsr)


def _density_kernel_v2(h, eps, c6, s45, m, cnt_ref, nbr_ref,
                       xc_ref, xp_ref, yp_ref, zp_ref, pi_ref):
    """Density-only phase-1 (pi = sum_j poly6, self included): the forward
    of the differentiable gas-constraint density (sim/pbf.density_ratio_at).
    Structure identical to :func:`_phase1_kernel_v2` minus the spiky/lambda
    accumulators — ~40% of its VPU work."""
    pid = pl.program_id(0)
    pi_ref[...] = jnp.zeros(pi_ref.shape, pi_ref.dtype)

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]
                    wa = jnp.zeros((S, m), jnp.float32)
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        _, w, _, _ = _pair_wcg_rows(
                            h, eps, c6, s45, xc, xsx, xsy, xsz, j, s * S, S, m)
                        wa = wa + w
                    pi_ref[ci, sl] += jnp.sum(wa, axis=1, keepdims=True)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _density_bwd_kernel_v2(h, c6, m, cnt_ref, nbr_ref,
                           xc_ref, gc_ref, xp_ref, yp_ref, zp_ref, gp_ref,
                           dx_ref):
    """Analytic adjoint of the density sum: with per-particle upstream
    cotangents g (w.r.t. pi), dL/dx_i = sum_j (g_i + g_j) * W'(d2_ij) *
    2 (x_i - x_j), where W'(d2) = -3 c6 (h^2 - d2)^2 inside the support
    (poly6 differentiated w.r.t. squared distance). The symmetric (g_i+g_j)
    factor folds the j->i density contributions into one pass, so the
    adjoint is ONE phase-2-shaped kernel (neighbor g rows read from a
    VMEM-resident plane, like phase-2's lambda). Self pairs contribute 0
    (dx = 0); dead-slot pairs drop via the sentinel coordinates."""
    pid = pl.program_id(0)
    dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
    h2 = h * h

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc = xc_ref[ci, sl]
                    gc = gc_ref[ci, sl]                        # (S, 1)
                    z = jnp.zeros((S, m), jnp.float32)
                    ba = z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        gn = gp_ref[pl.ds(nb, 1), :]           # (1, m)
                        dx0 = xc[:, 0:1] - xsx
                        dx1 = xc[:, 1:2] - xsy
                        dx2 = xc[:, 2:3] - xsz
                        d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                        t2 = h2 - d2
                        dw = jnp.where(d2 < h2, (-3.0 * c6) * t2 * t2, 0.0)
                        b = (gc + gn) * dw * 2.0
                        ba = ba + b
                        bx0 = bx0 + b * xsx
                        bx1 = bx1 + b * xsy
                        bx2 = bx2 + b * xsz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    dx_ref[ci, sl] += rs(ba) * xc - jnp.concatenate(
                        [rs(bx0), rs(bx1), rs(bx2)], axis=1)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


@functools.partial(jax.jit, static_argnames=("h", "eps", "c6", "s45"))
def density_slots_v2(grid: DenseGrid, h, eps, c6, s45, planes=None):
    """Per-slot density pi (self included) — fwd of the differentiable
    gas-constraint density. Dead-slot rows carry garbage (never gathered)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, bs, xp, yp, zp = _plane_parts(grid, _planes(grid) if planes is None
                                       else planes)
    xc = bs[:-1]
    (xc,), cp = _pad_c([xc], c)
    cnt_p = jnp.pad(cnt[:-1], (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)
    g = cp // CPB
    kern = functools.partial(_density_kernel_v2, float(h), float(eps),
                             float(c6), float(s45), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    pi = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), _full((c + 1, m)), _full((c + 1, m)),
                      _full((c + 1, m))],
            out_specs=blk(m, 1),
        ),
        out_shape=jax.ShapeDtypeStruct((cp, m, 1), jnp.float32),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xc, xp, yp, zp)
    return pi[:c, :, 0]


@functools.partial(jax.jit, static_argnames=("h", "c6"))
def density_bwd_slots_v2(grid: DenseGrid, g_s, h, c6, planes=None):
    """Adjoint of :func:`density_slots_v2`: per-slot dL/dx (C, M, 3) from
    per-slot upstream cotangents ``g_s`` (C+1, M; dead slots MUST be 0)."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, bs, xp, yp, zp = _plane_parts(grid, _planes(grid) if planes is None
                                       else planes)
    xc = bs[:-1]
    gc = g_s[:-1][..., None]
    (xc, gc), cp = _pad_c([xc, gc], c)
    cnt_p = jnp.pad(cnt[:-1], (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)
    g = cp // CPB
    kern = functools.partial(_density_bwd_kernel_v2, float(h), float(c6), m)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(m, 3), blk(m, 1), _full((c + 1, m)),
                      _full((c + 1, m)), _full((c + 1, m)), _full((c + 1, m))],
            out_specs=blk(m, 3),
        ),
        out_shape=jax.ShapeDtypeStruct((cp, m, 3), jnp.float32),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xc, gc, xp, yp, zp, g_s)
    return dx[:c]


# ------------------------- two-set velocity splat ---------------------------
#
# delta_i = secs * (sum_j W_ij vel_j) / max(sum_j W_ij, eps) over query points
# i and source particles j (update_visual_particles / get_visual_xyz_from_nn,
# gm_dynamics.py:1360-1402 and :1453-1500). The padded radius_query path the
# r4 recon-step trace pinned at ~250 ms/step (a (Nq, 864) candidate sort,
# 3.2M-row (Nq, K) gathers, and two ~45 ms scatter-add adjoints at the 28k
# workload); these kernels are phase-1/phase-2-shaped two-lattice versions
# with NO top-K: queries bind to the source grid's lattice (bin_queries) and
# every in-radius pair contributes — torch_cluster's max_num_neighbors
# truncation is a CUDA memory cap, not physics (same argument as the dense
# density path).


def _splat_fwd_kernel(h, ms, cnt_ref, nbr_ref,
                      xq_ref, xp_ref, yp_ref, zp_ref, vx_ref, vy_ref, vz_ref,
                      wv_ref, ws_ref):
    """Query-centric forward: per query slot, poly6-weighted source-velocity
    sum (wv, 3) and weight sum (ws, 1). Grid over QUERY cells; the source
    coordinate AND velocity planes stay VMEM-resident ((C_src+1, M) each),
    neighbor rows are dynamic loads via the scalar-prefetched query->source
    ``nbr`` table. No self-pair exclusion (distinct point sets); dead source
    slots drop via sentinel coordinates; dead query rows produce garbage
    that is never gathered back to point space."""
    pid = pl.program_id(0)
    wv_ref[...] = jnp.zeros(wv_ref.shape, wv_ref.dtype)
    ws_ref[...] = jnp.zeros(ws_ref.shape, ws_ref.dtype)
    h2 = h * h
    mq = xq_ref.shape[1]

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, mq)
            for s in range(mq // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xq = xq_ref[ci, sl]                        # (S, 3)
                    z = jnp.zeros((S, ms), jnp.float32)
                    wa, bv0, bv1, bv2 = z, z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        dx0 = xq[:, 0:1] - (xp_ref[pl.ds(nb, 1), :] + sx)
                        dx1 = xq[:, 1:2] - (yp_ref[pl.ds(nb, 1), :] + sy)
                        dx2 = xq[:, 2:3] - (zp_ref[pl.ds(nb, 1), :] + sz)
                        d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                        t2 = h2 - d2
                        w = jnp.where(d2 < h2, t2 * t2 * t2, 0.0)
                        wa = wa + w
                        bv0 = bv0 + w * vx_ref[pl.ds(nb, 1), :]
                        bv1 = bv1 + w * vy_ref[pl.ds(nb, 1), :]
                        bv2 = bv2 + w * vz_ref[pl.ds(nb, 1), :]
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    wv_ref[ci, sl] += jnp.concatenate(
                        [rs(bv0), rs(bv1), rs(bv2)], axis=1)
                    ws_ref[ci, sl] += rs(wa)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _splat_bwd_kernel(h, mq, cnt_ref, rnbr_ref,
                      xs_ref, vs_ref, xqp_ref, yqp_ref, zqp_ref,
                      pxp_ref, pyp_ref, pzp_ref, qp_ref,
                      gx_ref, gv_ref):
    """Source-centric analytic adjoint. With per-query precomputed planes
    p_i = secs * cot_i / S_i (3) and q_i = <cot_i, delta_i> / S_i (0 where
    the eps clamp is active), the pair factor is f_ij = <p_i, vel_j> - q_i
    and

        g_est_j = sum_i f_ij * W'(d2_ij) * 2 (est_j - x_i)
        g_vel_j = sum_i W_ij * p_i

    (W'(d2) = -3 (h^2-d2)^2 inside the support; the c6 coefficient is folded
    into p/q by the caller, like the fwd kernel's unnormalized w). One
    phase-2-shaped pass over SOURCE cells reading 7 VMEM-resident query
    planes via the reverse source->query ``rnbr`` table."""
    pid = pl.program_id(0)
    gx_ref[...] = jnp.zeros(gx_ref.shape, gx_ref.dtype)
    gv_ref[...] = jnp.zeros(gv_ref.shape, gv_ref.dtype)
    h2 = h * h
    ms = xs_ref.shape[1]

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, ms)
            for s in range(ms // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xs = xs_ref[ci, sl]                        # (S, 3)
                    vs = vs_ref[ci, sl]                        # (S, 3)
                    z = jnp.zeros((S, mq), jnp.float32)
                    fda, fd0, fd1, fd2 = z, z, z, z
                    wp0, wp1, wp2 = z, z, z
                    for j in range(27):
                        nb = rnbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xq0 = xqp_ref[pl.ds(nb, 1), :] + sx    # (1, mq) abs-ish
                        xq1 = yqp_ref[pl.ds(nb, 1), :] + sy
                        xq2 = zqp_ref[pl.ds(nb, 1), :] + sz
                        dx0 = xs[:, 0:1] - xq0
                        dx1 = xs[:, 1:2] - xq1
                        dx2 = xs[:, 2:3] - xq2
                        d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                        t2 = h2 - d2
                        inside = d2 < h2
                        w = jnp.where(inside, t2 * t2 * t2, 0.0)
                        dw = jnp.where(inside, -3.0 * t2 * t2, 0.0)
                        px = pxp_ref[pl.ds(nb, 1), :]
                        py = pyp_ref[pl.ds(nb, 1), :]
                        pz = pzp_ref[pl.ds(nb, 1), :]
                        f = (vs[:, 0:1] * px + vs[:, 1:2] * py
                             + vs[:, 2:3] * pz - qp_ref[pl.ds(nb, 1), :])
                        fd = f * dw
                        fda = fda + fd
                        fd0 = fd0 + fd * xq0
                        fd1 = fd1 + fd * xq1
                        fd2 = fd2 + fd * xq2
                        wp0 = wp0 + w * px
                        wp1 = wp1 + w * py
                        wp2 = wp2 + w * pz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    gx_ref[ci, sl] += 2.0 * (
                        rs(fda) * xs - jnp.concatenate(
                            [rs(fd0), rs(fd1), rs(fd2)], axis=1))
                    gv_ref[ci, sl] += jnp.concatenate(
                        [rs(wp0), rs(wp1), rs(wp2)], axis=1)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


@functools.partial(jax.jit, static_argnames=("h",))
def splat_slots(grid: DenseGrid, qgrid: DenseGrid, vel_s, h,
                planes=None, qplanes=None):
    """Two-set forward: per QUERY slot unnormalized (wv (Cq, Mq, 3),
    ws (Cq, Mq)) with W = (h^2-d2)^3 (caller applies the c6 coefficient —
    it cancels in wv/ws anyway). ``vel_s`` is the (C_src+1, M, 3) slot-space
    source velocity (slot_gather; dead-slot values are irrelevant — their
    sentinel coordinates zero the weight)."""
    cs, ms = grid.nbr.shape[0], grid.capacity
    cq, mq = qgrid.nbr.shape[0], qgrid.capacity
    _, bs, xp, yp, zp = _plane_parts(grid, _planes(grid) if planes is None
                                     else planes)
    qcnt, qbs, _, _, _ = _plane_parts(qgrid, _planes(qgrid) if qplanes is None
                                      else qplanes)
    xq = qbs[:-1]
    (xq,), cqp = _pad_c([xq], cq)
    cnt_p = jnp.pad(qcnt[:-1], (0, cqp - cq))
    nbr_p = jnp.pad(qgrid.nbr, ((0, cqp - cq), (0, 0)),
                    constant_values=cs).reshape(-1)
    g = cqp // CPB
    kern = functools.partial(_splat_fwd_kernel, float(h), ms)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(mq, 3), _full((cs + 1, ms)), _full((cs + 1, ms)),
                      _full((cs + 1, ms)), _full((cs + 1, ms)),
                      _full((cs + 1, ms)), _full((cs + 1, ms))],
            out_specs=(blk(mq, 3), blk(mq, 1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cqp, mq, 3), jnp.float32),
            jax.ShapeDtypeStruct((cqp, mq, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xq, xp, yp, zp,
      vel_s[..., 0], vel_s[..., 1], vel_s[..., 2])
    wv, ws = out
    return wv[:cq], ws[:cq, :, 0]


@functools.partial(jax.jit, static_argnames=("h",))
def splat_bwd_slots(grid: DenseGrid, qgrid: DenseGrid, rnbr, vel_s, p_s, q_s,
                    h, planes=None, qplanes=None):
    """Two-set adjoint: per SOURCE slot (g_est (C_src, M, 3),
    g_vel (C_src, M, 3)) from query-slot planes ``p_s`` (Cq+1, Mq, 3) and
    ``q_s`` (Cq+1, Mq) (dead query slots MUST be 0). ``rnbr`` is
    bin_queries' source->query reverse table."""
    cs, ms = grid.nbr.shape[0], grid.capacity
    cq, mq = qgrid.nbr.shape[0], qgrid.capacity
    cnt, bs, _, _, _ = _plane_parts(grid, _planes(grid) if planes is None
                                    else planes)
    _, _, xqp, yqp, zqp = _plane_parts(qgrid, _planes(qgrid) if qplanes is None
                                       else qplanes)
    xs = bs[:-1]
    vs = vel_s[:-1]
    (xs, vs), csp = _pad_c([xs, vs], cs)
    cnt_p = jnp.pad(cnt[:-1], (0, csp - cs))
    rnbr_p = jnp.pad(rnbr, ((0, csp - cs), (0, 0)),
                     constant_values=cq).reshape(-1)
    g = csp // CPB
    kern = functools.partial(_splat_bwd_kernel, float(h), mq)
    blk = lambda *s: pl.BlockSpec((CPB,) + s, lambda i, *_: (i,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[blk(ms, 3), blk(ms, 3), _full((cq + 1, mq)),
                      _full((cq + 1, mq)), _full((cq + 1, mq)),
                      _full((cq + 1, mq)), _full((cq + 1, mq)),
                      _full((cq + 1, mq)), _full((cq + 1, mq))],
            out_specs=(blk(ms, 3), blk(ms, 3)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((csp, ms, 3), jnp.float32),
            jax.ShapeDtypeStruct((csp, ms, 3), jnp.float32),
        ),
        interpret=_interpret(),
    )(cnt_p, rnbr_p, xs, vs, xqp, yqp, zqp,
      p_s[..., 0], p_s[..., 1], p_s[..., 2], q_s)
    gx, gv = out
    return gx[:cs], gv[:cs]


# --------------------------- v3: transposed-IO projection ---------------------------
#
# The r4 device trace of the grid-reuse tick (tools/xplane_summary.py over a
# 3-tick capture at the 28k bench workload) attributed only ~4.2 of the
# ~8.5 ms/iteration to the v2 pair kernels; the other half was XLA glue
# created by the kernels' 3-D shapes and the between-kernel lambda math:
# ~10 layout copies/iteration ({1,0,2}<->{2,1,0} on the (C,M,3)/(C,M,1)
# pallas operands, ~0.2 ms each), the sg/c2d2 reduce fusions, and the
# lambda elementwise chain. The v3 kernels remove that glue structurally:
#
# - ALL center-side per-slot operands and results are (M, C) SLOT-MAJOR
#   ("transposed") 2-D planes. Inside the kernel, center-side quantities are
#   naturally (S, 1) columns, so transposed blocks read and write with NO
#   relayout — and XLA-side the whole Jacobi update (delta apply, force
#   accumulation, diagnostics) runs in transposed plane space as trivially
#   fused 2-D elementwise ops. Neighbor-side reads keep the v2 cell-major
#   (C+1, M) VMEM-resident planes. The only per-iteration layout ops left
#   are 3 coordinate transposes + 1 lambda transpose (XLA tiled transposes,
#   ~1 MB each).
# - Lambda is computed IN-KERNEL at the end of phase 1 (it needs only the
#   per-slot reductions the kernel already holds), so the (C,M,3) sg output,
#   its reduce fusions, and the XLA lambda chain disappear. Phase 2
#   likewise applies the delta scaling (1/p0/max(nlen+counts, eps))
#   in-kernel and emits final per-component delta planes.
#
# Reference solver being replaced: gm_dynamics.py:1076-1184 (radius_graph +
# per-pair scatter per Jacobi iteration).


def _pair_wcg_cols(h, eps, c6, s45, xc0, xc1, xc2, xsx, xsy, xsz, j, s0, S, m):
    """_pair_wcg with the CENTER coords as three explicit (S, 1) columns."""
    dx0 = xc0 - xsx
    dx1 = xc1 - xsy
    dx2 = xc2 - xsz
    d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
    seye = None
    if j == _SELF_J:
        seye = (lax.broadcasted_iota(jnp.int32, (S, m), 0) + s0
                == lax.broadcasted_iota(jnp.int32, (S, m), 1))
        d2 = jnp.where(seye, 0.0, d2)
    h2 = h * h
    t2 = h2 - d2
    w = jnp.where(d2 < h2, c6 * t2 * t2 * t2, 0.0)
    inv = lax.rsqrt(d2 + eps)
    rlen = (d2 + eps) * inv
    hr = h - rlen
    cg = jnp.where(rlen < h, (-s45) * hr * hr * inv, 0.0)
    if j == _SELF_J:
        cg = jnp.where(seye, 0.0, cg)
    return d2, w, cg, seye


def _phase1_kernel_v3(h, eps, c6, s45, inv_p0, relax, m, cnt_ref, nbr_ref,
                      xcT_ref, ycT_ref, zcT_ref, imT_ref,
                      xp_ref, yp_ref, zp_ref,
                      lamT_ref, piT_ref, nlT_ref):
    """Phase 1 with transposed center IO and in-kernel lambda.

    Outputs (all (m, CPB) blocks of (M, C) planes): lamT (the per-slot
    lambda, FINAL — includes the 1/imass density division), piT (RAW poly6
    sum, pre-imass, so the XLA side recovers s_p6 and pi/p_ratio), nlT
    (in-radius candidate count, self included)."""
    pid = pl.program_id(0)
    lamT_ref[...] = jnp.zeros(lamT_ref.shape, lamT_ref.dtype)
    piT_ref[...] = jnp.zeros(piT_ref.shape, piT_ref.dtype)
    nlT_ref[...] = jnp.zeros(nlT_ref.shape, nlT_ref.dtype)
    h2 = h * h
    ip2 = inv_p0 * inv_p0

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc0 = xcT_ref[0, sl, ci:ci + 1]            # (S, 1)
                    xc1 = ycT_ref[0, sl, ci:ci + 1]
                    xc2 = zcT_ref[0, sl, ci:ci + 1]
                    z = jnp.zeros((S, m), jnp.float32)
                    wa, cga, c2a, nla = z, z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx     # (1, m)
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        d2, w, cg, _ = _pair_wcg_cols(
                            h, eps, c6, s45, xc0, xc1, xc2, xsx, xsy, xsz,
                            j, s * S, S, m)
                        wa = wa + w
                        cga = cga + cg
                        c2a = c2a + cg * cg * d2
                        nla = nla + (d2 <= h2).astype(jnp.float32)
                        bx0 = bx0 + cg * xsx
                        bx1 = bx1 + cg * xsy
                        bx2 = bx2 + cg * xsz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    pi_raw = rs(wa)
                    rcg = rs(cga)
                    sg0 = rcg * xc0 - rs(bx0)
                    sg1 = rcg * xc1 - rs(bx1)
                    sg2 = rcg * xc2 - rs(bx2)
                    gr_dot = (sg0 * sg0 + sg1 * sg1 + sg2 * sg2) * ip2
                    grad_dot = rs(c2a) * ip2
                    p_ratio = pi_raw / imT_ref[0, sl, ci:ci + 1] * inv_p0
                    lam = -(p_ratio - 1.0) / (grad_dot + gr_dot + relax)
                    piT_ref[0, sl, ci:ci + 1] += pi_raw
                    lamT_ref[0, sl, ci:ci + 1] += lam
                    nlT_ref[0, sl, ci:ci + 1] += rs(nla)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _phase2_kernel_v3(h, eps, c6, s45, k_p, e_p, inv_denom, inv_p0, m,
                      cnt_ref, nbr_ref,
                      xcT_ref, ycT_ref, zcT_ref, lamcT_ref, ncT_ref,
                      xp_ref, yp_ref, zp_ref, lamp_ref,
                      dxT_ref, dyT_ref, dzT_ref, crT_ref, nsT_ref):
    """Phase 2 with grouped center IO and in-kernel delta scaling + apply:
    emits the UPDATED per-component coordinate planes
    x + (sum_j b*(xi-xj)) / p0 / max(nlen + counts, 1e-20), so the Jacobi
    position update needs NO XLA-side select/add pass. The out blocks are
    initialized by copying the center coordinate block: rows the strip loop
    never touches (cnt=0 cells, rows past ceil(cnt/S)*S) pass through
    unchanged, which keeps dead/empty rows on their sentinel coordinates —
    and dead rows inside processed strips get a zero delta anyway (their
    sentinel pairs all fall outside h; the self-diagonal cg is zeroed)."""
    pid = pl.program_id(0)
    dxT_ref[...] = xcT_ref[...]
    dyT_ref[...] = ycT_ref[...]
    dzT_ref[...] = zcT_ref[...]
    crT_ref[...] = jnp.zeros(crT_ref.shape, crT_ref.dtype)
    nsT_ref[...] = jnp.zeros(nsT_ref.shape, nsT_ref.dtype)
    h2 = h * h
    int_pow = float(e_p).is_integer() and 0 < int(e_p) <= 8

    for ci in range(CPB):
        cell = pid * CPB + ci

        @pl.when(cnt_ref[cell] > 0)
        def _():
            S = min(STRIP, m)
            for s in range(m // S):
                sl = slice(s * S, (s + 1) * S)

                def strip(sl=sl, s=s):
                    xc0 = xcT_ref[0, sl, ci:ci + 1]
                    xc1 = ycT_ref[0, sl, ci:ci + 1]
                    xc2 = zcT_ref[0, sl, ci:ci + 1]
                    lamc = lamcT_ref[0, sl, ci:ci + 1]         # (S, 1)
                    z = jnp.zeros((S, m), jnp.float32)
                    ba, cra, nsa = z, z, z
                    bx0, bx1, bx2 = z, z, z
                    for j in range(27):
                        nb = nbr_ref[cell * 27 + j]
                        sx, sy, sz = (float(v) * h for v in _OFFSETS[j])
                        xsx = xp_ref[pl.ds(nb, 1), :] + sx
                        xsy = yp_ref[pl.ds(nb, 1), :] + sy
                        xsz = zp_ref[pl.ds(nb, 1), :] + sz
                        ln = lamp_ref[pl.ds(nb, 1), :]         # (1, m)
                        d2, w, cg, seye = _pair_wcg_cols(
                            h, eps, c6, s45, xc0, xc1, xc2, xsx, xsy, xsz,
                            j, s * S, S, m)
                        if j == _SELF_J:
                            w = jnp.where(seye, 0.0, w)
                        wd = w * inv_denom
                        if int_pow:
                            acc = wd
                            for _ in range(int(e_p) - 1):
                                acc = acc * wd
                            corr = -k_p * acc
                        else:
                            corr = -k_p * jnp.power(wd, e_p)
                        b = (lamc + ln + corr) * cg
                        mask_ns = (d2 <= h2).astype(jnp.float32)
                        if j == _SELF_J:
                            mask_ns = jnp.where(seye, 0.0, mask_ns)
                        ba = ba + b
                        cra = cra + corr * mask_ns
                        nsa = nsa + mask_ns
                        bx0 = bx0 + b * xsx
                        bx1 = bx1 + b * xsy
                        bx2 = bx2 + b * xsz
                    rs = lambda a: jnp.sum(a, axis=1, keepdims=True)
                    rb = rs(ba)
                    scale = inv_p0 / jnp.maximum(
                        ncT_ref[0, sl, ci:ci + 1], 1e-20)
                    dxT_ref[0, sl, ci:ci + 1] += (rb * xc0 - rs(bx0)) * scale
                    dyT_ref[0, sl, ci:ci + 1] += (rb * xc1 - rs(bx1)) * scale
                    dzT_ref[0, sl, ci:ci + 1] += (rb * xc2 - rs(bx2)) * scale
                    crT_ref[0, sl, ci:ci + 1] += rs(cra)
                    nsT_ref[0, sl, ci:ci + 1] += rs(nsa)

                if s == 0:
                    strip()
                else:
                    pl.when(cnt_ref[cell] > s * S)(strip)


def _blkT(m):
    # grouped slot-major layout (G, M, CPB): block == trailing array dims,
    # which Mosaic accepts (a plain (M, CPB) lane-slab block does not pass
    # the (8, 128)-divisibility rule); the CPB=8 lane dim is padded to the
    # 128-lane width in VMEM, a few KB of waste per block
    return pl.BlockSpec((1, m, CPB), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def cells_to_grouped(a, fill=0.0):
    """Cell-major (C, M) plane -> grouped slot-major (G, M, CPB) kernel
    layout (column [g, :, ci] = the per-slot values of cell g*CPB+ci),
    padding C up to a multiple of CPB with ``fill``."""
    c, m = a.shape
    cp = -(-c // CPB) * CPB
    if cp != c:
        a = jnp.pad(a, ((0, cp - c), (0, 0)), constant_values=fill)
    return a.reshape(cp // CPB, CPB, m).transpose(0, 2, 1)


def grouped_to_cells(aG, c):
    """Grouped (G, M, CPB) -> cell-major (C, M)."""
    g, m, _ = aG.shape
    return aG.transpose(0, 2, 1).reshape(g * CPB, m)[:c]


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "inv_p0", "relax"))
def phase1_slots_v3(grid: DenseGrid, h, eps, c6, s45, inv_p0, relax,
                    xG, yG, zG, imG, planes3):
    """v3 phase 1: grouped slot-major center IO + in-kernel lambda.

    xG/yG/zG/imG: (G, M, CPB) grouped center planes (:func:`cells_to_grouped`;
    imG = inverse-mass with 1.0 at dead slots). planes3 = (cnt, xp, yp, zp):
    counts (C+1,) and the sentinel-filled neighbor-side (C+1, M) coordinate
    planes.

    Returns (lamG, piG_raw, nlG, s_p6, s_edges): (G, M, CPB) grouped planes,
    where lamG is the final per-slot lambda, piG_raw the pre-imass poly6
    sum, and the two scalars carry the same dead-self-diagonal corrections
    as phase1_slots_v2."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, xp, yp, zp = planes3
    g = xG.shape[0]
    cp = g * CPB
    cntc = cnt[:-1]
    cnt_p = jnp.pad(cntc, (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)
    kern = functools.partial(_phase1_kernel_v3, float(h), float(eps),
                             float(c6), float(s45), float(inv_p0),
                             float(relax), m)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[_blkT(m)] * 4 + [_full((c + 1, m))] * 3,
            out_specs=(_blkT(m),) * 3,
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((g, m, CPB), jnp.float32)
                        for _ in range(3)),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xG, yG, zG, imG, xp, yp, zp)
    lamG, piG, nlG = out
    s_eff = min(STRIP, m)
    rows_done = jnp.minimum(-(-cntc // s_eff) * s_eff, m)
    n_dead = jnp.sum(jnp.where(cntc > 0, rows_done - cntc, 0)
                     ).astype(jnp.float32)
    w_self = float(c6) * float(h) ** 6
    return (lamG, piG, nlG,
            jnp.sum(piG) - n_dead * w_self, jnp.sum(nlG) - n_dead)


@functools.partial(jax.jit,
                   static_argnames=("h", "eps", "c6", "s45", "k_p", "e_p",
                                    "inv_denom", "inv_p0"))
def phase2_slots_v3(grid: DenseGrid, h, eps, c6, s45, k_p, e_p, inv_denom,
                    inv_p0, xG, yG, zG, lamG, ncG, planes4):
    """v3 phase 2: grouped slot-major center IO + in-kernel delta scaling.

    lamG: (G, M, CPB) grouped lambda (phase1_slots_v3 output). ncG: grouped
    nlen + counts (the delta denominator). planes4 = (cnt, xp, yp, zp,
    lam_pad): neighbor-side planes, lam_pad (C+1, M) cell-major with a zero
    last row.

    Returns (dxG, dyG, dzG, s_corr, s_ns): final per-component grouped
    delta planes and the two global diagnostics."""
    c, m = grid.nbr.shape[0], grid.capacity
    cnt, xp, yp, zp, lam_pad = planes4
    g = xG.shape[0]
    cp = g * CPB
    cnt_p = jnp.pad(cnt[:-1], (0, cp - c))
    nbr_p = jnp.pad(grid.nbr, ((0, cp - c), (0, 0)),
                    constant_values=c).reshape(-1)
    kern = functools.partial(_phase2_kernel_v3, float(h), float(eps),
                             float(c6), float(s45), float(k_p), float(e_p),
                             float(inv_denom), float(inv_p0), m)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[_blkT(m)] * 5 + [_full((c + 1, m))] * 4,
            out_specs=(_blkT(m),) * 5,
        ),
        out_shape=tuple(jax.ShapeDtypeStruct((g, m, CPB), jnp.float32)
                        for _ in range(5)),
        interpret=_interpret(),
    )(cnt_p, nbr_p, xG, yG, zG, lamG, ncG, xp, yp, zp, lam_pad)
    dxG, dyG, dzG, crG, nsG = out
    return dxG, dyG, dzG, jnp.sum(crG), jnp.sum(nsG)
