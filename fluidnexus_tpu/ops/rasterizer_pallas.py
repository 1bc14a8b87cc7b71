"""Pallas TPU kernels for the per-tile alpha compositing hot loop.

MXU formulation — the per-Gaussian splat math is recast as matmuls so the
systolic array does the work and no per-Gaussian scalar extraction happens
(Mosaic forbids dynamic lane indexing):

  power(K,P)   = F(K,6) @ G(6,P)          F: per-Gaussian quadratic-form
                                          coefficients, G: per-pixel monomials
                                          [px^2, py^2, px*py, px, py, 1]
  prefix products: log-space, strictly-lower-triangular ones matrix per
                   block:  excl(K,P) = LT(B,B) @ log(1-a)(B,P)
  accumulation: accum(C,P) = col^T(C,K) @ w(K,P)
  backward reductions: per-Gaussian pixel moments M(K,6) = dpower @ G^T

This keeps all per-tile state in VMEM (the TPU analog of the reference CUDA
kernel's shared-memory streaming, forward.cu:250-373 / backward.cu:503-533 —
whose atomicAdd accumulation becomes per-slot gradient outputs reduced by
XLA's gather-transpose scatter outside).

Interface: ONE packed per-tile tensor (T, K, F) with columns
[xy(2) | conic(3) | opacity(1) | color(C) | depth(1)], F = 7 + C — a single
DMA stream in and a single packed gradient stream out (the previous
five-tensor interface cost ~1.1 ms/frame of XLA slice/concat relayout
fusions at the bench workload). Custom VJP at this boundary; upstream
(projection, gather) stays JAX autodiff.

Semantics identical to rasterizer._composite_tiles: alpha = min(.99,
op*exp(power)), skip power>0 / alpha<1/255, contributions masked once
T < 1e-4 (T itself keeps updating), median depth where T crosses 0.5
(transmittance is monotone, so the crossing is unique — computed in one
parallel reduction instead of a carried flag).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK = 64          # Gaussians per triangular-prefix block. B=128 was
                    # device-measured SLOWER (87.0 vs 89.6 fps): the LT/SU
                    # prefix matmuls scale O(B^2 P), so doubling B doubles
                    # their FLOPs — exactly cancelling the 128-wide MXU
                    # contraction win — while the bigger working set halves
                    # tiles-per-program
TILES_PER_PROGRAM = 8      # fwd tiles per grid program (amortizes overhead)
BWD_TILES_PER_PROGRAM = 4  # block-streamed bwd working set is O(BLOCK*P)
LOG_EPS = 1e-37     # log floor (a_eff <= 0.99 keeps log1p(-a) >= log(0.01))


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CPU tests, debugging)."""
    return jax.default_backend() != "tpu"


def _pixel_monomials(t, tiles_x, tile_x, tile_y, p):
    """G (6,P): [px^2, py^2, px*py, px, py, 1] and raw (1,P) px/py rows."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = ((t % tiles_x) * tile_x + idx % tile_x).astype(jnp.float32)
    py = ((t // tiles_x) * tile_y + idx // tile_x).astype(jnp.float32)
    ones = jnp.ones_like(px)
    g = jnp.concatenate([px * px, py * py, px * py, px, py, ones], axis=0)  # (6,P)
    return g, px, py


def _quadratic_coeffs(xy, con):
    """F (K,6) with power = F @ G:
    power = -.5 ca dx^2 - .5 cc dy^2 - cb dx dy,  dx = x - px, dy = y - py
          = -.5ca px^2 - .5cc py^2 - cb px py
            + (ca x + cb y) px + (cc y + cb x) py
            - .5ca x^2 - .5cc y^2 - cb x y
    """
    x = xy[:, 0:1]
    y = xy[:, 1:2]
    ca = con[:, 0:1]
    cb = con[:, 1:2]
    cc = con[:, 2:3]
    return jnp.concatenate(
        [-0.5 * ca, -0.5 * cc, -cb, ca * x + cb * y, cc * y + cb * x,
         -0.5 * ca * x * x - 0.5 * cc * y * y - cb * x * y], axis=1)


def _tri_lower(b):
    """Strictly-lower-triangular ones (B,B): row i sums entries j < i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return (c < r).astype(jnp.float32)


def _tri_lower_bd(b, half):
    """Block-diagonal strictly-lower ones (B,B): two independent (half,half)
    strict-lower blocks. DEVICE-BENCHED LOSER (r3): a PAIRED 128-row sweep
    (one block-diag matmul per pair + cross-half broadcast row-sums, halving
    the per-row matmul count in both kernels) measured 81.0 fps / 85.3 it/s
    vs 94.2 / 98.0 for the plain 64-row sweep at the bench workload — the
    XLA-level ~3us/matmul issue floor does NOT apply inside Mosaic, and the
    doubled (128,P) working set costs VMEM pressure instead. Kept for
    reference, not called."""
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return ((c < r) & (c // half == r // half)).astype(jnp.float32)


def _half_masks(b, half, p):
    """(B,1) masks selecting the low/high half-rows of a paired block."""
    r = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    hi = (r >= half).astype(jnp.float32)
    return 1.0 - hi, hi


def _excl_prefix_prod(v):
    """Exclusive prefix product along axis 0 (p_i = prod_{j<i} v_j) via
    Hillis-Steele doubling: log2(B) elementwise (B,P) multiplies with static
    sublane shifts. DEVICE-BENCHED LOSER vs the log-space exp(LT @ log(v))
    form: 86.1/86.8 fps vs 88.7 at the bench workload — the 6 concat-shift +
    multiply rounds at B=64 cost more VPU time than one log + one exp plus a
    (B,B)@(B,P) MXU matmul (r3; kept for reference, not called)."""
    b, p = v.shape
    x = jnp.concatenate([jnp.ones((1, p), v.dtype), v[:-1]], 0)
    d = 1
    while d < b:
        x = x * jnp.concatenate([jnp.ones((d, p), v.dtype), x[:-d]], 0)
        d *= 2
    return x


def _alphas(power, op, live):
    """Masked effective alpha + validity (shared fwd/bwd)."""
    raw = op * jnp.exp(power)                     # op (K,1) broadcasts
    alpha = jnp.minimum(0.99, raw)
    ok = (power <= 0.0) & (alpha >= 1.0 / 255.0) & (live > 0.5)
    return jnp.where(ok, alpha, 0.0), ok, raw


def _fwd_kernel(tiles_x, tile_x, tile_y, channels, block, tpb,
                cnt_ref, pk_ref, live_ref, accum_ref, ft_ref, med_ref,
                car_ref=None):
    for tl in range(tpb):
        _fwd_one(tiles_x, tile_x, tile_y, channels, block, tl,
                 cnt_ref, pk_ref, live_ref, accum_ref, ft_ref, med_ref, car_ref)


def _fwd_one(tiles_x, tile_x, tile_y, channels, block, tl,
             cnt_ref, pk_ref, live_ref, accum_ref, ft_ref, med_ref, car_ref):
    # car_ref is None on the no-grad render path: the per-block
    # log-transmittance residuals exist only for the backward pass, and
    # skipping them saves the (T, nb, P) HBM write on inference renders
    t = pl.program_id(0) * pk_ref.shape[0] + tl
    k = pk_ref.shape[1]
    p = tile_x * tile_y
    c = channels
    cnt = cnt_ref[t]  # live entries in this tile (scalar-prefetch SMEM)
    g_mat, _, _ = _pixel_monomials(t, tiles_x, tile_x, tile_y, p)

    # block-streamed: per-block power/alpha are recomputed inside the loop so
    # VMEM holds O(BLOCK*P) working set, never the full (K,P) — this is what
    # lets big tiles (32x32+) and K>256 fit the 16M scoped limit
    pk = pk_ref[tl]                                                   # (K,F)
    f_mat = _quadratic_coeffs(pk[:, 0:2], pk[:, 2:5])                 # (K,6)
    op = pk[:, 5:6]
    col = pk[:, 6:6 + c]
    dep = pk[:, 6 + c:7 + c]
    live = live_ref[tl]

    lt = _tri_lower(block)
    nb_all = k // block

    def run(nblocks):
        """Composite the first `nblocks` blocks with register carries; live
        entries sit at the FRONT of the K slots (pos = starts + arange <
        ends), so truncating at any block boundary past cnt is exact.
        Per-block log-transmittance carries are emitted (car_ref) so the
        backward pass reads them instead of re-running this sweep.
        (A product-space variant via _excl_prefix_prod was device-benched
        SLOWER — see that helper's docstring; a PAIRED 128-row variant via
        _tri_lower_bd likewise.)"""
        log_t = jnp.zeros((1, p), jnp.float32)
        accum = jnp.zeros((c, p), jnp.float32)
        med_num = jnp.zeros((1, p), jnp.float32)
        med_any = jnp.zeros((1, p), jnp.float32)
        for b in range(nblocks):
            sl = slice(b * block, (b + 1) * block)
            if car_ref is not None:
                car_ref[tl, b] = log_t[0]
            power_b = jnp.dot(f_mat[sl], g_mat, preferred_element_type=jnp.float32)
            a_b, ok_b, _ = _alphas(power_b, op[sl], live[sl])
            l_blk = jnp.log(jnp.maximum(1.0 - a_b, LOG_EPS))         # (B,P)
            excl = jnp.dot(lt, l_blk, preferred_element_type=jnp.float32)
            log_before = log_t + excl                                # (B,P)
            t_before = jnp.exp(log_before)
            # t_after = exp(log_before + l_blk) == t_before * (1 - a) exactly
            # (1 - a >= 0.01 > LOG_EPS always, so the log floor never bites);
            # the elementwise product saves one (B,P) exp per block
            t_after = t_before * (1.0 - a_b)
            w = a_b * t_before * (t_before >= 1e-4)
            accum += jnp.dot(col[sl].T, w, preferred_element_type=jnp.float32)
            cross = ((t_before > 0.5) & (t_after < 0.5) & ok_b).astype(jnp.float32)
            med_num += jnp.dot(dep[sl].T, cross, preferred_element_type=jnp.float32)
            med_any += jnp.sum(cross, axis=0, keepdims=True)
            log_t = log_t + jnp.sum(l_blk, axis=0, keepdims=True)
        for b in range(nblocks, nb_all):
            if car_ref is not None:
                car_ref[tl, b] = jnp.zeros((p,), jnp.float32)
        accum_ref[tl] = accum
        ft_ref[tl] = jnp.exp(log_t)
        med_ref[tl] = jnp.where(med_any > 0.5, med_num, 15.0)

    _occupancy_dispatch(run, cnt, nb_all, block)


def _occupancy_dispatch(run, cnt, nb, block):
    """Tiered occupancy branch (the TPU analog of renderCUDA's per-tile
    range loop, forward.cu:263-270): run the SHORTEST unrolled body that
    covers the tile's live count — tiers full/half/quarter (deduped). Real
    smoke scenes average ~30% fill, so most tiles take the quarter- or
    half-length body; dense tiles pay one predicated branch and keep
    register carries (a per-block scratch-carry guard measured ~10% slower
    on dense scenes)."""
    if nb <= 1:
        run(nb)
        return
    # full/half/quarter only: an eighth tier was device-benched at no extra
    # win while the added unrolled body pushed Mosaic compile of the demo's
    # multi-config graphs past 25 min (r3)
    tiers = sorted({nb, (nb + 1) // 2, (nb + 3) // 4})
    lo = 0
    for i, tier in enumerate(tiers):
        if i == len(tiers) - 1:
            cond = cnt > lo * block
        elif lo == 0:
            cond = cnt <= tier * block           # includes empty tiles
        else:
            cond = (cnt > lo * block) & (cnt <= tier * block)

        @pl.when(cond)
        def _(t=tier):
            run(t)

        lo = tier


def _bwd_kernel(tiles_x, tile_x, tile_y, channels, block, tpb,
                cnt_ref, pk_ref, live_ref, gacc_ref, gft_ref, ft_ref, car_ref,
                dpk_ref):
    for tl in range(tpb):
        _bwd_one(tiles_x, tile_x, tile_y, channels, block, tl,
                 cnt_ref, pk_ref, live_ref, gacc_ref, gft_ref, ft_ref, car_ref,
                 dpk_ref)


def _bwd_one(tiles_x, tile_x, tile_y, channels, block, tl,
             cnt_ref, pk_ref, live_ref, gacc_ref, gft_ref, ft_ref, car_ref,
             dpk_ref):
    """Single reverse-sweep per-tile gradient pass: the per-block
    log-transmittance carries and the final transmittance come from the
    FORWARD kernel (car/ft residuals — ~nb*P floats per tile, one cheap HBM
    round trip), so no forward re-sweep happens here; the reverse sweep forms
    the suffix color mass and all parameter grads via moment matmuls (TPU
    analog of backward.cu:503-533). Emits ONE packed gradient row per
    Gaussian slot: [dxy|dcon|dop|dcol|0]. Same occupancy branch as _fwd_one:
    at-most-half-full tiles run a half-length body."""
    t = pl.program_id(0) * pk_ref.shape[0] + tl
    k = pk_ref.shape[1]
    p = tile_x * tile_y
    c = channels
    nb = k // block
    cnt = cnt_ref[t]
    g_mat, px, py = _pixel_monomials(t, tiles_x, tile_x, tile_y, p)

    pk = pk_ref[tl]
    xy = pk[:, 0:2]
    con = pk[:, 2:5]
    op = pk[:, 5:6]
    col = pk[:, 6:6 + c]
    live = live_ref[tl]
    f_mat = _quadratic_coeffs(xy, con)                               # (K,6)

    def block_state(sl):
        """Recompute the per-block (B,P) quantities — block streaming keeps
        VMEM at O(BLOCK*P) instead of O(K*P), trading one extra small matmul
        per sweep for the capacity to run big tiles."""
        power_b = jnp.dot(f_mat[sl], g_mat, preferred_element_type=jnp.float32)
        a_b, ok_b, raw_b = _alphas(power_b, op[sl], live[sl])
        l_b = jnp.log(jnp.maximum(1.0 - a_b, LOG_EPS))
        return power_b, a_b, ok_b, raw_b, l_b

    lt = _tri_lower(block)
    su = lt.T  # strictly upper: row i sums j > i
    gacc = gacc_ref[tl]                                              # (C,P)
    x = xy[:, 0:1]
    y = xy[:, 1:2]
    ca = con[:, 0:1]
    cb = con[:, 1:2]
    cc = con[:, 2:3]

    def run(nblocks):
        # carries + final transmittance were emitted by the forward kernel
        g_t_term = gft_ref[tl] * ft_ref[tl]                          # (1,P)

        s_dot = jnp.zeros((1, p), jnp.float32)
        for b in range(nblocks - 1, -1, -1):
            sl = slice(b * block, (b + 1) * block)
            power_b, a_blk, ok_b, raw_b, l_blk = block_state(sl)
            gdotcol_b = jnp.dot(col[sl], gacc, preferred_element_type=jnp.float32)  # (B,P)
            excl = jnp.dot(lt, l_blk, preferred_element_type=jnp.float32)
            t_before = jnp.exp(car_ref[tl, b][None, :] + excl)       # (B,P)
            alive = t_before >= 1e-4
            w = a_blk * t_before * alive
            q = gdotcol_b * w                                        # (B,P)
            # suffix within block (j > i) + suffix from later blocks (s_dot)
            s_blk = jnp.dot(su, q, preferred_element_type=jnp.float32) + s_dot

            one_minus = jnp.maximum(1.0 - a_blk, 0.01)
            da = gdotcol_b * t_before * alive - (s_blk + g_t_term) / one_minus
            not_clamped = raw_b < 0.99
            da = jnp.where(ok_b & not_clamped, da, 0.0)
            dpower = da * a_blk                                      # (B,P)

            # exp(power) == raw / op (raw = op*exp(power) from _alphas): one
            # broadcast divide instead of a (B,P) transcendental
            dop_blk = jnp.sum(jnp.where(ok_b & not_clamped,
                                        da * (raw_b / jnp.maximum(op[sl], 1e-20)),
                                        0.0), axis=1, keepdims=True)
            # ALL six pixel moments in ONE matmul: the needed monomials
            # [1, px, py, px^2, px*py, py^2] are exactly g_mat's six rows
            # [px^2, py^2, px*py, px, py, 1] — reuse it as the RHS (was three
            # (B,P)@(P,3) matmuls over 9 columns with only 6 unique)
            m_all = jnp.dot(dpower, g_mat.T, preferred_element_type=jnp.float32)  # (B,6)
            mxx = m_all[:, 0:1]
            myy = m_all[:, 1:2]
            mxy = m_all[:, 2:3]
            mx = m_all[:, 3:4]
            my = m_all[:, 4:5]
            m0 = m_all[:, 5:6]

            xb, yb = x[sl], y[sl]
            cab, cbb, ccb = ca[sl], cb[sl], cc[sl]
            # dca = sum dp * (-.5)(x-px)^2 = -.5 (x^2 m0 - 2 x mx + mxx)
            dca = -0.5 * (xb * xb * m0 - 2 * xb * mx + mxx)
            dcc = -0.5 * (yb * yb * m0 - 2 * yb * my + myy)
            dcb = -(xb * yb * m0 - xb * my - yb * mx + mxy)
            # dpower/dx = -(ca (x-px) + cb (y-py))
            dxg = -(cab * (xb * m0 - mx) + cbb * (yb * m0 - my))
            dyg = -(ccb * (yb * m0 - my) + cbb * (xb * m0 - mx))
            dcol = jnp.dot(w, gacc.T, preferred_element_type=jnp.float32)  # (B,C)

            # ONE packed store per block (static slices): keeps only the
            # (1,P) carries live across unrolled block iterations, so the
            # stack slots of each block's temporaries can be reused
            dpk_ref[tl, sl] = jnp.concatenate(
                [dxg, dyg, dca, dcb, dcc, dop_blk, dcol, jnp.zeros_like(dop_blk)], axis=1)
            s_dot = s_dot + jnp.sum(q, axis=0, keepdims=True)
        # blocks past the live count: zero gradient rows
        for b in range(nblocks, nb):
            dpk_ref[tl, slice(b * block, (b + 1) * block)] = (
                jnp.zeros((block, 7 + c), jnp.float32))

    _occupancy_dispatch(run, cnt, nb, block)


_RMW_UNROLL = 4


def _combine_kernel(tpb, k, u, cnt_ref, gid_ref, g_ref, out_ref):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for tl in range(tpb):
        t = pid * tpb + tl
        cnt = cnt_ref[t]
        iters = (cnt + u - 1) // u

        def body(i, _, tl=tl, t=t):
            base = i * u
            for uu in range(u):
                idx = gid_ref[t * k + base + uu]
                out_ref[pl.ds(idx, 1), :] += g_ref[pl.ds(tl * k + base + uu, 1), :]
            return 0

        jax.lax.fori_loop(0, iters, body, 0)


def combine_rows_rmw(g, gid, cnt, n):
    """Gradient combine ``out[m] = sum over live slots with gid==m of g`` as
    a Pallas kernel: the (n, F) accumulator stays VMEM-resident across the
    whole grid and each live row is a dynamic read-modify-write, with the
    per-tile loop bounded by the live count (XLA's sorted scatter-add walks
    every window slot, dead or not).

    Device study at the 32k/960x544 bench workload (all row-granular
    alternatives are latency-bound at ~8-16 ns/row on v5e):
      - XLA sorted scatter-add (default): 2.58 ms in-graph
      - this kernel, count-bounded + 4x unrolled: 2.25 ms standalone
      - inverse-sort (extra 295k 2-op sort + (N,9,F) row gather): 1.95 + 2.4 ms
      - column-sliced gathers (3x F<=4): 4.2 ms
      - segmented-scan adjoint (cfg.seg_adjoint): 70.9 vs 96 fps (r3)
    Rows past the live count inside the unroll window are exact zeros (the
    bwd kernel masks dead slots), so the u-overshoot is harmless.
    """
    num_tiles, k = gid.shape
    # the unroll window may overshoot cnt but must never overshoot the tile:
    # with cnt == k and k % u != 0 it would RMW rows of the NEXT tile twice
    # (and out of bounds on the last tile).
    assert k % _RMW_UNROLL == 0, (
        f"tile_capacity ({k}) must be a multiple of _RMW_UNROLL "
        f"({_RMW_UNROLL})")
    f = g.shape[-1]
    tpb = 16 if num_tiles % 16 == 0 else (10 if num_tiles % 10 == 0 else 1)
    grid = num_tiles // tpb
    kern = functools.partial(_combine_kernel, tpb, k, _RMW_UNROLL)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[pl.BlockSpec((tpb * k, f), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, f), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.float32),
        interpret=_interpret(),
    )(cnt, gid.reshape(-1), g.reshape(num_tiles * k, f))


def _pad_tiles(arrs, num_tiles, tpb):
    """Pad the leading tile axis to a multiple of tiles-per-program."""
    pad = (-num_tiles) % tpb
    if pad == 0:
        return arrs, num_tiles
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs], num_tiles + pad


def _counts(live):
    """Per-tile live-entry counts (live is a front-packed prefix mask)."""
    return jnp.sum(live > 0.5, axis=1).astype(jnp.int32)


def _run_fwd(packed, live, tiles_x, tile_x, tile_y, want_residuals=True):
    num_tiles, k, f = packed.shape
    channels = f - 7
    p = tile_x * tile_y
    assert p % LANE == 0, p
    blk = min(BLOCK, k)
    assert k % blk == 0, (k, blk)
    # adaptive tiles/program: with block streaming the fwd working set is
    # ~8 live (BLOCK,P) f32 arrays per tile plus the lane-padded (K,F) input
    # buffer; budget 12M of the 16M scoped VMEM
    per_tile = 32 * blk * p + 1024 * k
    cap = max(1, (12 << 20) // per_tile)
    tpb = min(TILES_PER_PROGRAM, max(num_tiles, 1), cap)
    cnt = _counts(live)
    (packed, livev, cnt), nt = _pad_tiles([packed, live[..., None], cnt], num_tiles, tpb)
    kern = functools.partial(_fwd_kernel, tiles_x, tile_x, tile_y, channels, blk, tpb)
    block = lambda *shape: pl.BlockSpec((tpb,) + shape, lambda t, c: (t,) + (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    nb = k // blk
    out_specs = [block(channels, p), block(1, p), block(1, p)]
    out_shape = [
        jax.ShapeDtypeStruct((nt, channels, p), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, p), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, p), jnp.float32),
    ]
    if want_residuals:
        out_specs.append(block(nb, p))
        out_shape.append(jax.ShapeDtypeStruct((nt, nb, p), jnp.float32))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // tpb,),
            in_specs=[block(k, f), block(k, 1)],
            out_specs=tuple(out_specs),
        ),
        interpret=_interpret(),
        out_shape=tuple(out_shape),
    )(cnt, packed, livev)
    return tuple(o[:num_tiles] for o in out)


def _run_bwd(packed, live, gacc, gft, ft, carr, tiles_x, tile_x, tile_y):
    num_tiles, k, f = packed.shape
    channels = f - 7
    p = tile_x * tile_y
    blk = min(BLOCK, k)
    nb = k // blk
    per_tile = 40 * blk * p + 2048 * k + 8 * p * nb
    cap = max(1, (12 << 20) // per_tile)
    tpb = min(BWD_TILES_PER_PROGRAM, max(num_tiles, 1), cap)
    cnt = _counts(live)
    (packed, livev, gacc, gft, ft, carr, cnt), nt = _pad_tiles(
        [packed, live[..., None], gacc, gft, ft, carr, cnt], num_tiles, tpb)
    kern = functools.partial(_bwd_kernel, tiles_x, tile_x, tile_y, channels, blk, tpb)
    block = lambda *shape: pl.BlockSpec((tpb,) + shape, lambda t, c: (t,) + (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // tpb,),
            in_specs=[block(k, f), block(k, 1), block(channels, p), block(1, p),
                      block(1, p), block(nb, p)],
            out_specs=block(k, f),
        ),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct((nt, k, f), jnp.float32),
    )(cnt, packed, livev, gacc, gft, ft, carr)
    return out[:num_tiles]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles_packed(packed, live, tiles_x, tile_x, tile_y):
    """Per-tile front-to-back compositing over the packed per-tile tensor.

    packed (T,K,7+C): [xy|conic|opacity|color|depth] rows, depth-sorted,
    PRE-GATHERED per tile; live (T,K) f32 mask. Returns (accum (T,C,P),
    final_T (T,1,P), med (T,1,P)) with P row-major over (tile_y, tile_x).
    Differentiable in the xy/conic/opacity/color columns; the depth column
    and live are constants (the reference backward also ignores
    depth/ordering grads)."""
    return _run_fwd(packed, live, tiles_x, tile_x, tile_y, want_residuals=False)


def _composite_fwd(packed, live, tiles_x, tile_x, tile_y):
    accum, ft, med, carr = _run_fwd(packed, live, tiles_x, tile_x, tile_y)
    return (accum, ft, med), (packed, live, ft, carr)


def _composite_bwd(tiles_x, tile_x, tile_y, res, g):
    packed, live, ft, carr = res
    gacc, gft, _gmed = g
    dpk = _run_bwd(packed, live, gacc, gft, ft, carr, tiles_x, tile_x, tile_y)
    return dpk, jnp.zeros_like(live)


composite_tiles_packed.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y):
    """Back-compat wrapper over composite_tiles_packed for separate arrays."""
    packed = jnp.concatenate([xy, con, op[..., None], col, dep[..., None]], -1)
    return composite_tiles_packed(packed, live, tiles_x, tile_x, tile_y)
