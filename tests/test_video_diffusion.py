import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.diffusion.schedules import DiffusionSchedule
from fluidnexus_tpu.diffusion.video.dit import VideoDiT, VideoDiTConfig, lora_param_filter, make_3d_rope
from fluidnexus_tpu.diffusion.video.sampling import (
    DynamicCFG, VDenoiser, sample_ddim, sample_dpmpp2m_sde, zero_snr_alphas_sqrt,
)
from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig, VideoVAE, chunked_decode

TINY_DIT = VideoDiTConfig(
    hidden_size=64, num_layers=2, num_heads=4, patch_size=2, in_channels=4,
    out_channels=4, text_hidden_size=32, text_length=5, latent_frames=3,
    latent_height=8, latent_width=8, dtype=jnp.float32,
)

TINY_VAE = VAE3DConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                       temporal_compress_times=2)


def test_dit_forward_shapes():
    model = VideoDiT(TINY_DIT)
    x = jnp.zeros((2, 3, 4, 8, 8))
    t = jnp.array([10, 500])
    txt = jnp.zeros((2, 5, 32))
    params = model.init(jax.random.PRNGKey(0), x, t, txt)
    out = model.apply(params, x, t, txt)
    assert out.shape == (2, 3, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_lora_params_exist_and_filter():
    cfg = VideoDiTConfig(**{**TINY_DIT.__dict__, "lora_rank": 4})
    model = VideoDiT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 4, 8, 8)),
                        jnp.array([1]), jnp.zeros((1, 5, 32)))
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_paths = [p for p, _ in flat if any("lora" in str(k) for k in p)]
    assert len(lora_paths) > 0
    # LoRA is a no-op at init: lora_b zero-init
    base = VideoDiT(TINY_DIT)
    bp = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 4, 8, 8)),
                   jnp.array([1]), jnp.zeros((1, 5, 32)))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 8, 8))
    o1 = model.apply(params, x, jnp.array([7]), jnp.ones((1, 5, 32)))
    assert np.isfinite(np.asarray(o1)).all()
    assert lora_param_filter(("block_0", "attn", "qkv", "lora_a"))
    assert not lora_param_filter(("block_0", "attn", "qkv", "kernel"))


def test_rope_tables():
    cos, sin = make_3d_rope(TINY_DIT)
    n_img = 3 * 4 * 4
    assert cos.shape == (n_img, TINY_DIT.head_dim)
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0, atol=1e-6)  # position 0
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-6)


def test_zero_snr_ladder():
    a, t = zero_snr_alphas_sqrt(10)
    assert len(a) == 11 and len(t) == 11
    assert a[0] == 0.0  # zero terminal SNR: noisiest step has alpha 0
    assert a[-1] == 1.0
    assert np.all(np.diff(a) > 0)  # ascending toward clean


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    vae = VideoVAE(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16, 16, 3))  # T=5=4k+1
    variables = vae.init({"params": jax.random.PRNGKey(1)}, x)
    params = variables["params"]
    z = vae.apply({"params": params}, x, method=vae.encode, mutable=["cache"])[0]
    # temporal 2x: (5-1)/2+1 = 3; spatial 2x: 8
    assert z.shape == (1, 3, 8, 8, 4)
    recon, _ = vae.apply({"params": params}, z, method=vae.decode, mutable=["cache"])
    assert recon.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(recon)).all()


@pytest.mark.slow
def test_vae_chunked_decode_matches_full():
    """Chunked decode with the carried conv cache must closely match the full
    decode. NOT bit-exact: GroupNorm statistics span the chunk's time extent,
    so chunking perturbs them — the reference's fake-CP chunked decode
    (cp_enc_dec.py:243-291) carries exactly the same approximation. The causal
    convs themselves are exact across chunks (verified by the shape/continuity
    and the tight mean error below)."""
    vae = VideoVAE(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 16, 16, 3))
    params = vae.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode, mutable=["cache"])[0]

    full, _ = vae.apply({"params": params}, z, method=vae.decode, mutable=["cache"])
    chunked = chunked_decode(vae, params, z, chunk=2)
    assert chunked.shape == full.shape
    diff = np.abs(np.asarray(chunked) - np.asarray(full))
    assert diff.mean() < 0.05, diff.mean()
    a, b = np.asarray(chunked).ravel(), np.asarray(full).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.97, corr


def test_sampler_recovers_simple_target():
    """With a perfect denoiser (always returns the target), one DDIM pass must
    return the target; the SDE sampler must land close to it."""
    target = jnp.ones((1, 2, 4, 8, 8)) * 0.5

    def perfect(x, t, cond):
        # v such that x0 estimate = target: v = (a x - target)/s
        return x  # placeholder; we bypass VDenoiser below

    def perfect_denoiser(x, alpha_sqrt, t_idx, cond):
        return target

    x = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = sample_ddim(perfect_denoiser, x, cond=None, uc=None, num_steps=8,
                      guider=lambda u, c, i: c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)

    out2 = sample_dpmpp2m_sde(perfect_denoiser, x, cond=None, uc=None, num_steps=8,
                              guider=lambda u, c, i: c, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(target), atol=1e-3)


def test_prefix_clamping_and_sdedit():
    target = jnp.zeros((1, 4, 2, 4, 4))
    prefix = jnp.ones((1, 2, 2, 4, 4)) * 0.7

    def perfect_denoiser(x, alpha_sqrt, t_idx, cond):
        return target

    x = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = sample_dpmpp2m_sde(perfect_denoiser, x, cond=None, num_steps=8,
                             guider=lambda u, c, i: c, rng=jax.random.PRNGKey(1),
                             prefix_clean_frames=prefix)
    # prefix frames survive verbatim, remaining frames go to the target
    np.testing.assert_allclose(np.asarray(out[:, :2]), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 2:]), 0.0, atol=1e-3)

    # SDEdit with strength ~0.5 starts from the noised input mid-ladder
    frames_z = jnp.full(target.shape, 0.3)
    out2 = sample_dpmpp2m_sde(perfect_denoiser, x, cond=None, num_steps=8,
                              guider=lambda u, c, i: c, rng=jax.random.PRNGKey(2),
                              frames_z=frames_z, sdedit_strength=0.5)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-3)


def test_dynamic_cfg_schedule():
    g = DynamicCFG(scale=6.0, exp=5.0, num_steps=50)
    u = jnp.zeros((2, 1))
    c = jnp.ones((2, 1))
    early = g(u, c, 1)     # early steps: scale ~1
    late = g(u, c, 50)     # final: 1 + 6*(1-cos(pi))/2 = 7
    assert float(early[0, 0]) < 1.5
    np.testing.assert_allclose(float(late[0, 0]), 7.0, atol=1e-6)


@pytest.mark.slow
def test_vae_spatial_tiled_decode_matches_serial():
    """Width-tiled decode with halo crossfade (the single-chip fallback for
    the real 480x720 geometry whose full-frame decode exceeds 16 GiB HBM)
    must closely match the untiled chunked decode — same approximation class
    as the temporal chunking (per-tile GroupNorm statistics)."""
    from fluidnexus_tpu.diffusion.video.vae3d import spatial_tiled_decode

    vae = VideoVAE(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 16, 32, 3))
    params = vae.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode, mutable=["cache"])[0]
    serial = chunked_decode(vae, params, z, chunk=2)
    tiled = spatial_tiled_decode(vae, params, z, chunk=2, tiles=2, halo=4)
    assert tiled.shape == serial.shape
    d = np.abs(np.asarray(tiled) - np.asarray(serial))
    assert d.mean() < 0.06, d.mean()
    corr = np.corrcoef(np.asarray(tiled).ravel(), np.asarray(serial).ravel())[0, 1]
    assert corr > 0.99, corr


def test_vae_chunked_decode_first_latents_split():
    """first_latents=1 (memory-tight split: the 4k+1 head frame decodes
    alone) must produce the same frame count and near-identical output."""
    vae = VideoVAE(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 16, 16, 3))
    params = vae.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode, mutable=["cache"])[0]
    ref = chunked_decode(vae, params, z, chunk=2)                    # [3,2] split
    alt = chunked_decode(vae, params, z, chunk=2, first_latents=1)   # [1,2,2]
    assert alt.shape == ref.shape
    corr = np.corrcoef(np.asarray(alt).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.98, corr


@pytest.mark.slow
def test_vae_chunked_encode_matches_full():
    """Cache-carried chunked ENCODE (the training-path mirror of
    chunked_decode): exact when a single chunk covers the clip; multi-chunk
    carries only the fake-CP GroupNorm-statistics approximation."""
    from fluidnexus_tpu.diffusion.video.vae3d import chunked_encode

    vae = VideoVAE(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 13, 16, 16, 3))
    params = vae.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    full = vae.apply({"params": params}, x, None, sample=False,
                     method=vae.encode, mutable=["cache"])[0]

    one = chunked_encode(vae, params, x, chunk=7)   # whole clip in one chunk
    np.testing.assert_allclose(np.asarray(one), np.asarray(full), atol=1e-4)

    ch = chunked_encode(vae, params, x, chunk=2)
    assert ch.shape == full.shape
    corr = np.corrcoef(np.asarray(ch).ravel(), np.asarray(full).ravel())[0, 1]
    assert corr > 0.95, corr
