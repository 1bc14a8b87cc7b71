import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.diffusion.ldm.autoencoder import AutoencoderKL, KLVAEConfig
from fluidnexus_tpu.diffusion.ldm.clip import CLIPVisionConfig, CLIPVisionTower
from fluidnexus_tpu.diffusion.ldm.model import NovelViewModel, get_pose_delta
from fluidnexus_tpu.diffusion.ldm.unet import UNet, UNetConfig

TINY_UNET = UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                       channel_mult=(1, 2), num_res_blocks=1,
                       attention_resolutions=(1, 2), num_heads=4, context_dim=16)
TINY_VAE = KLVAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
TINY_CLIP = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=2,
                             heads=4, output_dim=12)


@pytest.mark.slow
def test_unet_shapes():
    m = UNet(TINY_UNET)
    x = jnp.zeros((2, 16, 16, 8))
    t = jnp.array([3, 800])
    ctx = jnp.zeros((2, 1, 16))
    p = m.init(jax.random.PRNGKey(0), x, t, ctx)
    out = m.apply(p, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_klvae_roundtrip():
    m = AutoencoderKL(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    p = m.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    z = m.apply({"params": p}, x, method=m.encode)
    assert z.shape == (1, 8, 8, 4)  # f=2 for 2 levels
    rec = m.apply({"params": p}, z, method=m.decode)
    assert rec.shape == x.shape


def test_clip_tower():
    m = CLIPVisionTower(TINY_CLIP)
    x = jnp.zeros((2, 28, 28, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    emb = m.apply(p, x)
    assert emb.shape == (2, 12)


def test_pose_delta_matches_reference_semantics():
    """90-degree azimuth rotation at same elevation/radius -> [0, 1, 0, 0]."""
    def rt_for(az, radius=2.0, elev=math.pi / 2):
        # camera center in world coords
        c = np.array([radius * math.sin(elev) * math.cos(az),
                      radius * math.sin(elev) * math.sin(az),
                      radius * math.cos(elev)])
        r = np.eye(3)  # orientation irrelevant for get_T (uses center only)
        t = -r.T @ c
        return np.concatenate([r, t[:, None]], 1)

    d = get_pose_delta(rt_for(math.pi / 2), rt_for(0.0))
    np.testing.assert_allclose(d, [0.0, 1.0, 0.0, 0.0], atol=1e-6)
    d2 = get_pose_delta(rt_for(0.0), rt_for(0.0))
    np.testing.assert_allclose(d2, [0.0, 0.0, 1.0, 0.0], atol=1e-6)


@pytest.mark.slow
def test_novel_view_loss_and_sample():
    model = NovelViewModel(unet_config=TINY_UNET, vae_config=TINY_VAE, clip_config=TINY_CLIP)
    # patch context dim: cc_projection is fixed 772->768 in the reference; the
    # tiny test uses the full-size projection with a tiny CLIP -> pad
    params = None
    # full-size cc needs clip 768; use the real geometry for the glue test
    model = NovelViewModel(
        unet_config=UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                               channel_mult=(1, 2), num_res_blocks=1,
                               attention_resolutions=(2,), num_heads=4, context_dim=768),
        vae_config=TINY_VAE,
        clip_config=CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=1,
                                     heads=4, output_dim=768),
    )
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    dt = jnp.asarray(np.array([[0.1, 0.0, 1.0, 0.0]], np.float32))

    loss = model.loss_fn(params, img, cond, dt, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))

    out = model.ddim_sample(params, cond, dt, jax.random.PRNGKey(4), num_steps=3,
                            image_size=32)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_plms_eps_prime_coefficients():
    """Adams-Bashforth rules match plms.py:242-253 exactly."""
    import numpy as np

    from fluidnexus_tpu.diffusion.ldm.model import plms_eps_prime

    rng = np.random.default_rng(0)
    e, h1, h2, h3 = (rng.normal(size=(2, 3)) for _ in range(4))
    hist = np.stack([h1, h2, h3])
    np.testing.assert_allclose(plms_eps_prime(e, hist, 1), (3 * e - h1) / 2)
    np.testing.assert_allclose(plms_eps_prime(e, hist, 2),
                               (23 * e - 16 * h1 + 5 * h2) / 12)
    np.testing.assert_allclose(plms_eps_prime(e, hist, 3),
                               (55 * e - 59 * h1 + 37 * h2 - 9 * h3) / 24)


@pytest.mark.slow
def test_plms_sample_runs_tiny():
    model = NovelViewModel(
        unet_config=UNetConfig(in_channels=8, out_channels=4, model_channels=32,
                               channel_mult=(1, 2), num_res_blocks=1,
                               attention_resolutions=(2,), num_heads=4, context_dim=768),
        vae_config=TINY_VAE,
        clip_config=CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=1,
                                     heads=4, output_dim=768),
    )
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    cond = jnp.ones((1, 32, 32, 3)) * 0.5
    dt = jnp.zeros((1, 4))
    out = model.plms_sample(params, cond, dt, jax.random.PRNGKey(1),
                            num_steps=5, image_size=32)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
