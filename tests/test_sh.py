"""SH color path of the gm_gs model (ops/sh.py wired through
splat.render.render_gs_sh; basis parity: forward.cu:20-68 / sh_utils.py)."""
import numpy as np
import jax.numpy as jnp

from fluidnexus_tpu.ops.sh import SH_C0, SH_C1, eval_sh, rgb_to_sh0, sh_to_color


def test_sh_deg0_reproduces_rgb():
    rgb = np.random.default_rng(0).uniform(0.1, 0.9, (5, 3)).astype(np.float32)
    sh = rgb_to_sh0(rgb)[:, None, :]
    out = sh_to_color(0, jnp.asarray(sh), jnp.zeros((5, 3)), jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), rgb, atol=1e-6)


def test_sh_deg1_basis_matches_reference_formula():
    rng = np.random.default_rng(1)
    sh = rng.normal(size=(4, 4, 3)).astype(np.float32)
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(eval_sh(1, jnp.asarray(sh), jnp.asarray(dirs)))
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    expect = (SH_C0 * sh[:, 0] - SH_C1 * y * sh[:, 1]
              + SH_C1 * z * sh[:, 2] - SH_C1 * x * sh[:, 3])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_render_gs_sh_view_dependence():
    """The gm_gs pipe renders; colors change with the viewpoint (SH deg>0)."""
    import jax

    from fluidnexus_tpu.data.cameras import Camera
    from fluidnexus_tpu.ops import RasterizerConfig
    from fluidnexus_tpu.splat.background import BackgroundParams, create_from_points
    from fluidnexus_tpu.splat.render import render_gs_sh

    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
    model = create_from_points(pts, BackgroundParams(capacity=64))
    model = model._replace(color=jnp.asarray(rng.normal(0, 0.3, (64, 3)), jnp.float32),
                           opacity=jnp.full((64, 1), 2.0))
    rest = jnp.asarray(rng.normal(0, 0.3, (64, 15, 3)), jnp.float32)

    def cam(angle):
        R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, -1, 0],
                      [np.sin(angle), 0, -np.cos(angle)]])
        T = -R.T @ np.array([np.sin(angle) * 2.5, 0.0, 2.5 * np.cos(angle)])
        return Camera(uid=0, R=R, T=T, fovx=0.9, fovy=0.9, width=64, height=64)

    cfg = RasterizerConfig(tile_x=16, tile_y=16, tile_capacity=64, chunk=16)
    outs = []
    for a in (0.0, 0.8):
        c = cam(a)
        out = render_gs_sh(
            model, rest, 3, campos=c.camera_center,
            view_matrix=jnp.asarray(c.world_view), proj_matrix=jnp.asarray(c.full_proj),
            tan_fovx=c.tan_fovx, tan_fovy=c.tan_fovy, width=64, height=64,
            bg_color=jnp.zeros(3), config=cfg)
        assert np.isfinite(np.asarray(out.color)).all()
        outs.append(np.asarray(out.color))
    assert (outs[0] > 0).any()

    # same camera, deg 0 vs deg 3: view-dependent component really evaluated
    c = cam(0.0)
    o0 = render_gs_sh(model, rest, 0, campos=c.camera_center,
                      view_matrix=jnp.asarray(c.world_view), proj_matrix=jnp.asarray(c.full_proj),
                      tan_fovx=c.tan_fovx, tan_fovy=c.tan_fovy, width=64, height=64,
                      bg_color=jnp.zeros(3), config=cfg)
    assert np.abs(np.asarray(o0.color) - outs[0]).max() > 1e-4
