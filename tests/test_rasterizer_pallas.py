"""Pallas composite backend vs the XLA composite (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, rasterize
from tests.test_rasterizer import make_camera, random_scene


def _kw(cam, bg_ch=3):
    return dict(
        view_matrix=jnp.asarray(cam.world_view), proj_matrix=jnp.asarray(cam.full_proj),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, width=cam.width, height=cam.height,
        bg_color=jnp.zeros(bg_ch),
    )


def test_pallas_matches_xla_forward_and_grads():
    cam = make_camera(width=64, height=32)
    means, cols, ops, scales, rots = random_scene(n=50, c=3)
    kw = _kw(cam)
    cfg_x = RasterizerConfig(tile_capacity=64, chunk=16, dup_x=4, dup_y=2, backend="xla")
    cfg_p = RasterizerConfig(tile_capacity=64, chunk=16, dup_x=4, dup_y=2, backend="pallas")
    args = tuple(jnp.asarray(a) for a in (means, cols, ops, scales, rots))

    out_x = rasterize(*args, **kw, config=cfg_x)
    out_p = rasterize(*args, **kw, config=cfg_p)
    # the kernel's log-space prefix products round ~1e-5 relative to cumprod
    np.testing.assert_allclose(np.asarray(out_p.color), np.asarray(out_x.color), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.final_t), np.asarray(out_x.final_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_x.depth), atol=1e-4)

    def loss(cfg):
        def f(m, c, o, s, r):
            out = rasterize(m, c, o, s, r, **kw, config=cfg)
            return (out.color ** 2).sum() + 0.3 * out.final_t.sum()

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    gx = loss(cfg_x)
    gp = loss(cfg_p)
    for name, a, b in zip(("means", "cols", "ops", "scales", "rots"), gx, gp):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3 * scale,
                                   err_msg=name)


def test_pallas_ch1():
    cam = make_camera(width=32, height=32)
    means, cols, ops, scales, rots = random_scene(n=20, c=1, seed=5)
    kw = _kw(cam, bg_ch=1)
    cfg_x = RasterizerConfig(tile_capacity=32, chunk=8, dup_x=2, dup_y=2, backend="xla")
    cfg_p = RasterizerConfig(tile_capacity=32, chunk=8, dup_x=2, dup_y=2, backend="pallas")
    args = tuple(jnp.asarray(a) for a in (means, cols, ops, scales, rots))
    out_x = rasterize(*args, **kw, config=cfg_x)
    out_p = rasterize(*args, **kw, config=cfg_p)
    np.testing.assert_allclose(np.asarray(out_p.color), np.asarray(out_x.color), atol=1e-4)


def test_pallas_vmap_camera_batch_grads():
    """The pipelines vmap the render over a camera batch (train_physical
    make_*_step); the pallas path + scatter-free _tile_gather adjoint must
    batch correctly. Grads through vmap must equal the sum of per-camera
    grads."""
    from fluidnexus_tpu.data.cameras import Camera

    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    T = -R.T @ np.array([0.0, 0.0, 3.0])
    cams = [Camera(uid=i, R=R, T=T + 0.02 * i, fovx=0.9, fovy=0.6, width=32, height=32)
            for i in range(2)]
    means, cols, ops, scales, rots = random_scene(n=40, c=3, seed=7)
    args = tuple(jnp.asarray(a) for a in (means, cols, ops, scales, rots))
    cfg = RasterizerConfig(tile_capacity=32, chunk=8, dup_x=2, dup_y=2, backend="pallas")
    views = jnp.stack([jnp.asarray(c.world_view) for c in cams])
    projs = jnp.stack([jnp.asarray(c.full_proj) for c in cams])

    def render(m, v, p):
        return rasterize(m, *args[1:], view_matrix=v, proj_matrix=p,
                         tan_fovx=cams[0].tan_fovx, tan_fovy=cams[0].tan_fovy,
                         width=32, height=32, bg_color=jnp.zeros(3), config=cfg).color

    def batched_loss(m):
        return jax.vmap(lambda v, p: (render(m, v, p) ** 2).sum())(views, projs).sum()

    g_b = jax.grad(batched_loss)(args[0])
    g_s = sum(jax.grad(lambda m, v=v, p=p: (render(m, v, p) ** 2).sum())(args[0])
              for v, p in zip(views, projs))
    # same tolerance as the pallas-vs-xla grad check: the kernel's log-space
    # prefix products round ~1e-5 relative
    scale = max(float(jnp.abs(g_s).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s), atol=2e-4 * scale)


def test_combine_rows_rmw_matches_scatter():
    """The Pallas RMW gradient combine (cfg.rmw_combine) equals the XLA
    scatter-add over live rows; rows past the live count are zeros by the
    bwd-kernel contract and must not perturb the result."""
    from fluidnexus_tpu.ops.rasterizer_pallas import combine_rows_rmw

    rng = np.random.default_rng(3)
    t, k, n, f = 12, 32, 64, 10
    cnt = rng.integers(0, k + 1, (t,)).astype(np.int32)
    gid = np.stack([rng.permutation(n)[:k] for _ in range(t)]).astype(np.int32)
    g = rng.normal(size=(t, k, f)).astype(np.float32)
    live = np.arange(k)[None, :] < cnt[:, None]
    g = g * live[..., None]  # dead rows are exact zeros (bwd kernel contract)

    out = combine_rows_rmw(jnp.asarray(g), jnp.asarray(gid), jnp.asarray(cnt), n)
    ref = jnp.zeros((n, f)).at[jnp.asarray(np.where(live, gid, n).reshape(-1))].add(
        jnp.asarray(g.reshape(-1, f)), mode="drop")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rmw_combine_grads_match_xla_scatter_adjoint():
    """Full fwd+bwd equality: rmw_combine=True vs the default XLA scatter
    adjoint on a real raster grad."""
    means, cols, ops, scales, rots = random_scene(n=48, c=3, seed=11)
    cam = make_camera(32, 32)
    args = tuple(jnp.asarray(a) for a in (means, cols, ops, scales, rots))
    grads = {}
    for rmw in (False, True):
        cfg = RasterizerConfig(tile_capacity=32, chunk=8, dup_x=2, dup_y=2,
                               backend="pallas", rmw_combine=rmw)

        def loss(m, c, o, s, r):
            out = rasterize(m, c, o, s, r, view_matrix=jnp.asarray(cam.world_view),
                            proj_matrix=jnp.asarray(cam.full_proj),
                            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                            width=32, height=32, bg_color=jnp.zeros(3), config=cfg)
            return (out.color ** 2).sum()

        grads[rmw] = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(grads[False], grads[True]):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5 * scale)
