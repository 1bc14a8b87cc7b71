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
