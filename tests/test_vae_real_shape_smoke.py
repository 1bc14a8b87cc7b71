"""Real-scale causal-VAE smoke: the full CogVideoX decode geometry
(13x60x90x16 latents -> 49 frames at 480x720) executes on ONE chip via the
cache-carried chunked decode (the reference's fake-CP path decodes 2 latent
frames per call, gen_refine_pi2v_long.py:253-265, with CPU<->GPU offload
ping-pong; here it runs resident).

TPU-only and slow (minutes of compile): skipped under the CPU suite,
runnable standalone: `python tests/test_vae_real_shape_smoke.py`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                                  reason="real-shape decode needs TPU HBM")


@requires_tpu
def test_vae_real_shape_chunked_decode_single_chip():
    from fluidnexus_tpu.diffusion.video.vae3d import (
        VAE3DConfig, VideoVAE, spatial_tiled_decode)

    # the released geometry (z=16, ch=128) in bf16 compute: the fp32 decoder
    # at 480x720 runs ~1.6 GiB per conv activation and the 2-latent-frame
    # chunk exceeds 16 GiB HBM (the reference leans on an 80 GiB A100 +
    # CPU offload there); bf16 halves it and fits. chunk=1 is semantically
    # unavailable — the 4x temporal upsample needs >=2 latents per call,
    # same as the reference's 2-frames-per-call floor.
    cfg = VAE3DConfig(dtype=jnp.bfloat16)
    assert cfg.z_channels == 16 and cfg.ch == 128 and cfg.ch_mult == (1, 2, 2, 4)
    vae = VideoVAE(cfg)

    # init params at a tiny spatial size (shapes are conv kernels — identical
    # params serve any H/W), then decode at the REAL latent geometry
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3)))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_params > 2e8, f"not the released VAE size: {n_params/1e6:.0f}M"

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 13, 60, 90, 16), jnp.float32)
    t0 = time.perf_counter()
    # two width tiles + halo crossfade: even at bf16 and minimal [1,2,...]
    # temporal chunks the full-frame decode compiles to ~16.2 GiB (v5e has
    # 15.75); the resident full-res conv caches alone are multi-GiB. Tiled
    # halves fit with room (tiled-vs-serial parity: test_video_diffusion).
    out = spatial_tiled_decode(vae, params, z, chunk=2, first_latents=1,
                               tiles=2, halo=8)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    assert out.shape == (1, 49, 480, 720, 3), out.shape
    assert bool(jnp.isfinite(out).all())
    print(f"VAE decode 13x60x90x16 -> {tuple(out.shape)}: {dt:.1f}s "
          f"(incl. compile), {n_params/1e6:.0f}M params")

    # STEADY-STATE (VERDICT r3 item 7): second pass reuses the lru-cached jit
    # appliers, so this is the per-clip production decode cost. 13 latents at
    # first=1/chunk=2 = 7 temporal windows x 2 spatial tiles = 14 chunk calls.
    t0 = time.perf_counter()
    out = spatial_tiled_decode(vae, params, z, chunk=2, first_latents=1,
                               tiles=2, halo=8)
    jax.block_until_ready(out)
    ss = time.perf_counter() - t0
    print(f"VAE decode steady-state: {ss:.2f}s/clip = "
          f"{ss / 14 * 1000:.0f} ms/window-call (7 temporal x 2 tiles), "
          f"{ss / 49 * 1000:.0f} ms/output-frame")




@requires_tpu
def test_vae_real_shape_chunked_encode_single_chip():
    """Training-path mirror: a full 49x480x720 clip encodes to 13x60x90x16
    latents on one chip via cache-carried temporal chunks (the un-chunked
    encoder's full-res activations are ~4 GiB each and OOM)."""
    from fluidnexus_tpu.diffusion.video.vae3d import (
        VAE3DConfig, VideoVAE, chunked_encode)

    cfg = VAE3DConfig(dtype=jnp.bfloat16)
    vae = VideoVAE(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3)))["params"]

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 49, 480, 720, 3), jnp.float32)
    t0 = time.perf_counter()
    z = chunked_encode(vae, params, x, chunk=2, first_latents=1)
    jax.block_until_ready(z)
    dt = time.perf_counter() - t0
    assert z.shape == (1, 13, 60, 90, 16), z.shape
    assert bool(jnp.isfinite(z).all())
    print(f"VAE encode 49x480x720 -> {tuple(z.shape)}: {dt:.1f}s (incl. compile)")

    # STEADY-STATE (VERDICT r3 item 7): 13 latents at first=1/chunk=2 =
    # 7 chunk calls over 49 input frames.
    t0 = time.perf_counter()
    z = chunked_encode(vae, params, x, chunk=2, first_latents=1)
    jax.block_until_ready(z)
    ss = time.perf_counter() - t0
    print(f"VAE encode steady-state: {ss:.2f}s/clip = "
          f"{ss / 7 * 1000:.0f} ms/chunk-call, {ss / 49 * 1000:.0f} ms/input-frame")


if __name__ == "__main__":
    test_vae_real_shape_chunked_decode_single_chip()
    test_vae_real_shape_chunked_encode_single_chip()
    print("VAE real-shape smoke OK")
