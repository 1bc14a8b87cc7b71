"""Pallas TPU kernels for the per-tile alpha compositing hot loop.

The XLA composite in rasterizer.py streams (tiles, chunk, pixels) temporaries
through HBM; these kernels keep the whole per-tile state (transmittance,
accumulators, per-slot params) in VMEM — the TPU analog of the CUDA kernel's
shared-memory streaming (reference forward.cu:250-373 / backward.cu:503-533,
whose atomicAdd accumulation becomes per-slot gradient outputs reduced by
XLA's gather-transpose scatter outside the kernel).

Exposed as `composite_tiles` with a custom VJP at the PRE-GATHERED per-tile
arrays (T, K, ...) boundary: upstream (projection math, per-tile gather) stays
plain JAX autodiff.

Semantics identical to rasterizer._composite_tiles: alpha = min(.99,
op*exp(power)), skip power>0 / alpha<1/255, contributions masked once
T < 1e-4 (T itself keeps updating), median depth where T crosses 0.5.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CPU tests, debugging)."""
    return jax.default_backend() != "tpu"


def _pixel_coords(t, tiles_x, tile_x, tile_y, rows):
    """Global pixel coordinates for tile t as (rows, 128) f32 arrays."""
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE + \
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    px_local = p % tile_x
    py_local = p // tile_x
    base_x = (t % tiles_x) * tile_x
    base_y = (t // tiles_x) * tile_y
    return (base_x + px_local).astype(jnp.float32), (base_y + py_local).astype(jnp.float32)


def _fwd_kernel(tiles_x, tile_x, tile_y, channels,
                xy_ref, con_ref, op_ref, col_ref, dep_ref, live_ref,
                accum_ref, ft_ref, med_ref):
    t = pl.program_id(0)
    k = xy_ref.shape[1]
    p = tile_x * tile_y
    rows = p // LANE
    pixx, pixy = _pixel_coords(t, tiles_x, tile_x, tile_y, rows)

    accum_ref[...] = jnp.zeros((1, channels, rows, LANE), jnp.float32)
    med_ref[...] = jnp.full((1, rows, LANE), 15.0, jnp.float32)

    def body(i, carry):
        t_run, med_set = carry
        x = xy_ref[0, i, 0]
        y = xy_ref[0, i, 1]
        ca = con_ref[0, i, 0]
        cb = con_ref[0, i, 1]
        cc = con_ref[0, i, 2]
        op = op_ref[0, 0, i]
        dep = dep_ref[0, 0, i]
        lv = live_ref[0, 0, i]

        dx = x - pixx
        dy = y - pixy
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        ok = (power <= 0.0) & (alpha >= 1.0 / 255.0) & (lv > 0.5)
        a_eff = jnp.where(ok, alpha, 0.0)

        alive_px = t_run >= 1e-4
        w = a_eff * t_run * alive_px
        for c in range(channels):
            accum_ref[0, c] += w * col_ref[0, i, c]

        t_new = t_run * (1.0 - a_eff)
        cross = (t_run > 0.5) & (t_new < 0.5) & ok & alive_px & ~med_set
        med_ref[0] = jnp.where(cross, dep, med_ref[0])
        return t_new, med_set | cross

    t_run, _ = jax.lax.fori_loop(
        0, k, body,
        (jnp.ones((rows, LANE), jnp.float32), jnp.zeros((rows, LANE), bool)),
    )
    ft_ref[0] = t_run


def _bwd_kernel(tiles_x, tile_x, tile_y, channels,
                xy_ref, con_ref, op_ref, col_ref, dep_ref, live_ref,
                ft_ref, gacc_ref, gft_ref,
                dxy_ref, dcon_ref, dop_ref, dcol_ref):
    """Back-to-front per-tile gradient pass (the TPU version of
    backward.cu:503-533). Emits per-SLOT grads; scatter to Gaussians happens
    outside."""
    t = pl.program_id(0)
    k = xy_ref.shape[1]
    p = tile_x * tile_y
    rows = p // LANE
    pixx, pixy = _pixel_coords(t, tiles_x, tile_x, tile_y, rows)

    t_final = ft_ref[0]
    g_t_term = gft_ref[0] * t_final  # g_T * T_N, constant across slots

    def body(j, carry):
        i = k - 1 - j
        t_after, s_dot = carry  # s_dot = sum_c g_c * S_c (suffix color mass)
        x = xy_ref[0, i, 0]
        y = xy_ref[0, i, 1]
        ca = con_ref[0, i, 0]
        cb = con_ref[0, i, 1]
        cc = con_ref[0, i, 2]
        op = op_ref[0, 0, i]
        lv = live_ref[0, 0, i]

        dx = x - pixx
        dy = y - pixy
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw_alpha = op * jnp.exp(power)
        alpha = jnp.minimum(0.99, raw_alpha)
        ok = (power <= 0.0) & (alpha >= 1.0 / 255.0) & (lv > 0.5)
        a_eff = jnp.where(ok, alpha, 0.0)

        one_minus = 1.0 - a_eff                       # >= 0.01 where ok
        t_before = t_after / one_minus
        alive_px = t_before >= 1e-4
        w = a_eff * t_before * alive_px

        gdotcol = jnp.zeros((rows, LANE), jnp.float32)
        for c in range(channels):
            gdotcol += gacc_ref[0, c] * col_ref[0, i, c]

        # dL/da_i = (sum_c g_c col_ic) T_i [alive] - (sum_c g_c S_ic + g_T T_N)/(1-a_i)
        da = gdotcol * t_before * alive_px - (s_dot + g_t_term) / one_minus
        da = jnp.where(ok, da, 0.0)
        not_clamped = raw_alpha < 0.99
        dop = jnp.where(not_clamped, da * jnp.exp(power), 0.0)
        dpower = jnp.where(not_clamped, da * alpha, 0.0)

        dca = jnp.sum(dpower * (-0.5) * dx * dx)
        dcc = jnp.sum(dpower * (-0.5) * dy * dy)
        dcb = jnp.sum(dpower * (-dx * dy))
        # d power / d x = -(ca dx + cb dy); (dx = x - pixx)
        dxg = jnp.sum(dpower * -(ca * dx + cb * dy))
        dyg = jnp.sum(dpower * -(cc * dy + cb * dx))

        dxy_ref[0, i, 0] = dxg
        dxy_ref[0, i, 1] = dyg
        dcon_ref[0, i, 0] = dca
        dcon_ref[0, i, 1] = dcb
        dcon_ref[0, i, 2] = dcc
        dop_ref[0, 0, i] = jnp.sum(dop)
        for c in range(channels):
            dcol_ref[0, i, c] = jnp.sum(gacc_ref[0, c] * w)

        s_dot = s_dot + gdotcol * w
        return t_before, s_dot

    jax.lax.fori_loop(0, k, body,
                      (t_final, jnp.zeros((rows, LANE), jnp.float32)))


def _run_fwd(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y):
    num_tiles, k = op.shape
    channels = col.shape[-1]
    p = tile_x * tile_y
    rows = p // LANE
    kern = functools.partial(_fwd_kernel, tiles_x, tile_x, tile_y, channels)
    block = lambda *shape: pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    # (T,K) vectors carry a dummy middle axis: Mosaic requires the last two
    # block dims to tile (8,128) or equal the array dims
    return pl.pallas_call(
        kern,
        grid=(num_tiles,),
        interpret=_interpret(),
        in_specs=[block(k, 2), block(k, 3), block(1, k), block(k, channels),
                  block(1, k), block(1, k)],
        out_specs=(block(channels, rows, LANE), block(rows, LANE), block(rows, LANE)),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, channels, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, rows, LANE), jnp.float32),
        ),
    )(xy, con, op[:, None], col, dep[:, None], live[:, None])


def _run_bwd(xy, con, op, col, dep, live, ft, gacc, gft, tiles_x, tile_x, tile_y):
    num_tiles, k = op.shape
    channels = col.shape[-1]
    p = tile_x * tile_y
    rows = p // LANE
    kern = functools.partial(_bwd_kernel, tiles_x, tile_x, tile_y, channels)
    block = lambda *shape: pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    op, dep, live = op[:, None], dep[:, None], live[:, None]
    return pl.pallas_call(
        kern,
        grid=(num_tiles,),
        interpret=_interpret(),
        in_specs=[block(k, 2), block(k, 3), block(1, k), block(k, channels),
                  block(1, k), block(1, k),
                  block(rows, LANE), block(channels, rows, LANE), block(rows, LANE)],
        out_specs=(block(k, 2), block(k, 3), block(1, k), block(k, channels)),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, k, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, k, channels), jnp.float32),
        ),
    )(xy, con, op, col, dep, live, ft, gacc, gft)


def _run_bwd_squeezed(*args, **kwargs):
    dxy, dcon, dop, dcol = _run_bwd(*args, **kwargs)
    return dxy, dcon, dop[:, 0], dcol


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def composite_tiles(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y):
    """Per-tile front-to-back compositing.

    xy (T,K,2), con (T,K,3), op (T,K), col (T,K,C), dep (T,K) are the
    PRE-GATHERED per-tile Gaussian params (depth-sorted); live (T,K) f32 mask.
    Returns (accum (T,C,P_rows,128), final_T (T,P_rows,128), med (...)).
    Differentiable in xy/con/op/col; dep and live are treated as constants
    (the reference backward also ignores depth/ordering grads).
    """
    return _run_fwd(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y)


def _composite_fwd(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y):
    out = _run_fwd(xy, con, op, col, dep, live, tiles_x, tile_x, tile_y)
    return out, (xy, con, op, col, dep, live, out[1])


def _composite_bwd(tiles_x, tile_x, tile_y, res, g):
    xy, con, op, col, dep, live, ft = res
    gacc, gft, _gmed = g
    dxy, dcon, dop, dcol = _run_bwd_squeezed(xy, con, op, col, dep, live, ft,
                                             gacc, gft, tiles_x, tile_x, tile_y)
    return dxy, dcon, dop, dcol, jnp.zeros_like(dep), jnp.zeros_like(live)


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
