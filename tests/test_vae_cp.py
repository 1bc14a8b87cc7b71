"""Context-parallel VideoVAE: time-sharded encode/decode must EXACTLY match
the serial pass (parity target: CogVideoX/vae_modules/cp_enc_dec.py:137-242
_conv_split/_conv_gather/_pass_from_previous_rank)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.diffusion.video.vae3d import VAE3DConfig, VideoVAE
from fluidnexus_tpu.parallel.cp import cp_vae_decode, cp_vae_encode
from fluidnexus_tpu.parallel.mesh import make_mesh


def _build(tc, ch_mult, t, hw, seed=0):
    cfg = VAE3DConfig(ch=8, ch_mult=ch_mult, num_res_blocks=1, z_channels=4,
                      temporal_compress_times=tc)
    vae = VideoVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(seed), (1, t, hw, hw, 3))
    params = vae.init(jax.random.PRNGKey(seed + 1), x)["params"]
    return vae, params, x


@pytest.mark.parametrize("tc,ch_mult,t,n", [(2, (1, 2), 9, 4), (4, (1, 2, 2), 17, 2)])
@pytest.mark.slow
def test_cp_encode_matches_serial(tc, ch_mult, t, n):
    vae, params, x = _build(tc, ch_mult, t, 8)
    serial = vae.apply({"params": params}, x, sample=False, method=vae.encode,
                       mutable=["cache"])[0]
    mesh = make_mesh(n, dp=1, tp=1, time=n)
    cp = cp_vae_encode(vae, params, x, mesh)
    assert cp.shape == serial.shape
    np.testing.assert_allclose(np.asarray(cp), np.asarray(serial), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tc,ch_mult,t,n", [(2, (1, 2), 9, 4), (4, (1, 2, 2), 17, 2)])
@pytest.mark.slow
def test_cp_decode_matches_serial(tc, ch_mult, t, n):
    vae, params, x = _build(tc, ch_mult, t, 8, seed=7)
    z = vae.apply({"params": params}, x, sample=False, method=vae.encode,
                  mutable=["cache"])[0]
    serial = vae.apply({"params": params}, z, method=vae.decode, mutable=["cache"])[0]
    mesh = make_mesh(n, dp=1, tp=1, time=n)
    cp = cp_vae_decode(vae, params, z, mesh)
    assert cp.shape == serial.shape
    np.testing.assert_allclose(np.asarray(cp), np.asarray(serial), atol=1e-5, rtol=1e-5)
