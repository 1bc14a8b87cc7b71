import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.data.cameras import Camera
from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from tests.ref_rasterizer import rasterize_ref


def make_camera(width=48, height=32):
    # look down -z from z=+3 toward origin: R is cam->world
    R = np.diag([1.0, 1.0, -1.0])  # flip z so camera looks at origin
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    T = -R.T @ np.array([0.0, 0.0, 3.0])
    return Camera(uid=0, R=R, T=T, fovx=0.8, fovy=0.6, width=width, height=height)


def random_scene(n=60, c=3, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.0, (n, 3))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    ops = rng.uniform(0.2, 0.9, (n,)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, c)).astype(np.float32)
    return means, cols, ops, scales, rots


@pytest.mark.parametrize("c", [1, 3])
def test_matches_reference_oracle(c):
    cam = make_camera()
    means, cols, ops, scales, rots = random_scene(c=c)
    bg = np.zeros(c, np.float32)

    cfg = RasterizerConfig(tile_x=16, tile_y=16, dup_x=3, dup_y=2, tile_capacity=64, chunk=16)
    out = rasterize(
        jnp.asarray(means), jnp.asarray(cols), jnp.asarray(ops),
        jnp.asarray(scales), jnp.asarray(rots),
        view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        width=cam.width, height=cam.height, bg_color=jnp.asarray(bg), config=cfg,
    )
    ref_color, ref_depth, ref_t = rasterize_ref(
        means, cols, ops, scales, rots,
        cam.world_view, cam.full_proj, cam.tan_fovx, cam.tan_fovy, cam.width, cam.height, bg,
    )
    np.testing.assert_allclose(np.asarray(out.color), ref_color, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), ref_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=1e-3)


def test_background_composites_through_empty_pixels():
    cam = make_camera()
    means, cols, ops, scales, rots = random_scene(n=5)
    bg = np.array([0.3, 0.5, 0.7], np.float32)
    out = rasterize(
        jnp.asarray(means), jnp.asarray(cols), jnp.asarray(ops),
        jnp.asarray(scales), jnp.asarray(rots),
        view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        width=cam.width, height=cam.height, bg_color=jnp.asarray(bg),
        config=RasterizerConfig(tile_capacity=32, chunk=8),
    )
    img = np.asarray(out.color)
    corner = img[:, 0, 0]
    assert np.allclose(corner, bg, atol=1e-3) or np.all(np.asarray(out.final_t) <= 1.0)
    assert np.all(np.asarray(out.final_t) >= 0) and np.all(np.asarray(out.final_t) <= 1.0)


def test_alive_mask_excludes_padding():
    cam = make_camera()
    means, cols, ops, scales, rots = random_scene(n=40)
    bg = np.zeros(3, np.float32)
    cfg = RasterizerConfig(tile_capacity=64, chunk=16)

    kwargs = dict(
        view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        width=cam.width, height=cam.height, bg_color=jnp.asarray(bg), config=cfg,
    )
    out_small = rasterize(
        jnp.asarray(means[:25]), jnp.asarray(cols[:25]), jnp.asarray(ops[:25]),
        jnp.asarray(scales[:25]), jnp.asarray(rots[:25]), **kwargs,
    )
    alive = jnp.arange(40) < 25
    out_masked = rasterize(
        jnp.asarray(means), jnp.asarray(cols), jnp.asarray(ops),
        jnp.asarray(scales), jnp.asarray(rots), alive=alive, **kwargs,
    )
    np.testing.assert_allclose(np.asarray(out_small.color), np.asarray(out_masked.color), atol=1e-5)


def test_gradients_flow_and_match_fd():
    cam = make_camera(width=32, height=32)
    means, cols, ops, scales, rots = random_scene(n=12, seed=3)
    bg = np.zeros(3, np.float32)
    cfg = RasterizerConfig(tile_capacity=32, chunk=8)
    target = jnp.zeros((3, cam.height, cam.width))

    def loss_fn(means3d, colors, opacities):
        out = rasterize(
            means3d, colors, opacities, jnp.asarray(scales), jnp.asarray(rots),
            view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=cam.width, height=cam.height, bg_color=jnp.asarray(bg), config=cfg,
        )
        return jnp.sum((out.color - target) ** 2)

    g_means, g_cols, g_ops = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(cols), jnp.asarray(ops)
    )
    assert np.all(np.isfinite(np.asarray(g_means)))
    assert np.any(np.asarray(g_cols) != 0)

    # finite-difference check on one color entry (smooth w.r.t. colors)
    eps = 1e-3
    cols_p = cols.copy(); cols_p[0, 0] += eps
    cols_m = cols.copy(); cols_m[0, 0] -= eps
    fd = (loss_fn(jnp.asarray(means), jnp.asarray(cols_p), jnp.asarray(ops))
          - loss_fn(jnp.asarray(means), jnp.asarray(cols_m), jnp.asarray(ops))) / (2 * eps)
    np.testing.assert_allclose(float(g_cols[0, 0]), float(fd), rtol=2e-2, atol=1e-4)


def test_depth_sorted_compositing_order():
    """A nearer opaque Gaussian must occlude a farther one regardless of input order."""
    cam = make_camera(width=32, height=32)
    means = np.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]], np.float32)  # first is nearer to cam at z=3? cam looks -z from +3 => z=0.5 is nearer
    scales = np.full((2, 3), 0.3, np.float32)
    rots = np.tile(np.array([1.0, 0, 0, 0], np.float32), (2, 1))
    ops = np.array([0.95, 0.95], np.float32)
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    bg = np.zeros(3, np.float32)

    def render(order):
        return np.asarray(
            rasterize(
                jnp.asarray(means[order]), jnp.asarray(cols[order]), jnp.asarray(ops[order]),
                jnp.asarray(scales[order]), jnp.asarray(rots[order]),
                view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
                tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                width=cam.width, height=cam.height, bg_color=jnp.asarray(bg),
                config=RasterizerConfig(tile_capacity=32, chunk=8),
            ).color
        )

    a = render([0, 1])
    b = render([1, 0])
    np.testing.assert_allclose(a, b, atol=1e-5)
    center = a[:, 16, 16]
    assert center[0] > center[1]  # red (near) dominates


def test_tight_culling_exact_and_effective():
    """Tight ellipse-rect culling must be OUTPUT-EXACT (it may only drop
    (gaussian, tile) slots whose alpha stays under the 1/255 per-pixel skip,
    forward.cu:329-338) and must actually drop slots on scenes with large
    gaussians."""
    import dataclasses

    from fluidnexus_tpu.ops.rasterizer import _build_tile_lists, project_gaussians

    cam = make_camera(width=128, height=128)
    means, cols, ops, scales, rots = random_scene(n=80, c=3, seed=11)
    scales = scales * 2.0  # 1-2.5-tile radii: corner tiles listed, unclamped
    cfg = RasterizerConfig(tile_capacity=512, chunk=16, dup_x=4, dup_y=4, backend="xla")
    cfg_off = dataclasses.replace(cfg, tight_cull=False)
    kw = dict(view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
              tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=cam.width,
              height=cam.height, bg_color=jnp.zeros(3))
    args = (jnp.asarray(means), jnp.asarray(cols), jnp.asarray(ops),
            jnp.asarray(scales), jnp.asarray(rots))

    out_on = rasterize(*args, **kw, config=cfg)
    out_off = rasterize(*args, **kw, config=cfg_off)
    # only compositing ORDER packing changes -> fp-noise-level differences
    np.testing.assert_allclose(np.asarray(out_on.color), np.asarray(out_off.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_on.final_t), np.asarray(out_off.final_t),
                               atol=1e-5)

    proj = project_gaussians(args[0], args[3], args[4],
                             jnp.asarray(cam.world_view), jnp.asarray(cam.full_proj),
                             cam.tan_fovx, cam.tan_fovy, cam.width, cam.height)
    _, live_on = _build_tile_lists(proj, cfg, 8, 8, opacities=args[2])
    _, live_off = _build_tile_lists(proj, cfg_off, 8, 8, opacities=args[2])
    n_on, n_off = int(jnp.sum(live_on)), int(jnp.sum(live_off))
    assert n_on < n_off, (n_on, n_off)


def test_gather_rows_segsum_adjoint_matches_plain_gather():
    """_gather_rows_segsum must reproduce XLA's scatter-add adjoint exactly,
    including when dead tile-window spillover replicates one id across many
    more slots than max_run (the sentinel idx_bwd masking keeps real runs
    bounded — rasterizer.py:_gather_rows_segsum)."""
    import jax

    from fluidnexus_tpu.ops.rasterizer import _gather_rows_segsum

    rng = np.random.default_rng(7)
    n, t, k, f = 37, 6, 16, 5
    packed = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (t, k)), jnp.int32)
    live = jnp.asarray(rng.random((t, k)) < 0.6)
    # adversarial spillover: one gaussian id fills most of two tiles' dead
    # slots (> max_run replicas) — its live rows stay <= max_run
    idx = idx.at[0].set(3)
    idx = idx.at[1].set(3)
    live = live.at[0].set(False)
    live = live.at[1].set(False)
    live = live.at[0, 0].set(True)
    cot = jnp.asarray(rng.standard_normal((t, k, f)), jnp.float32)
    cot = jnp.where(live[..., None], cot, 0.0)  # dead slots: zero cotangent

    def loss_ref(p):
        return jnp.vdot(p[idx], cot)

    def loss_seg(p):
        idx_bwd = jnp.where(live, idx, n)
        return jnp.vdot(_gather_rows_segsum(p, idx, idx_bwd, 9), cot)

    g_ref = jax.grad(loss_ref)(packed)
    g_seg = jax.grad(loss_seg)(packed)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
