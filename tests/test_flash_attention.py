"""Flash-attention path of the video DiT: fires at UNALIGNED sequence
lengths (the 5B joint sequence 226+17550=17776 is not a 512 multiple) via
front-pad + segment ids, and matches the XLA fused attention numerically.

TPU-only (the Pallas kernel has no CPU interpreter entry here); the driver
and `python tests/test_flash_attention.py` on the axon chip exercise it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.diffusion.video.dit import _joint_attention

requires_tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                                  reason="pallas flash attention needs TPU")


def _ref_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bqhd", w, v)


@requires_tpu
@pytest.mark.parametrize("s", [777, 2274])
def test_flash_matches_reference_unaligned(s):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2, s, 64)), jnp.float32) for _ in range(3))
    out = jax.jit(_joint_attention)(q, k, v)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


@requires_tpu
def test_flash_kernel_taken_at_5b_shape():
    """The lowered HLO at the (226+17550)-token joint shape must contain the
    Pallas flash kernel custom-call (VERDICT: the old s%512 gate silently
    never fired at the real shape)."""
    s = 226 + 17550
    q = jnp.zeros((1, 1, s, 64), jnp.bfloat16)
    hlo = jax.jit(_joint_attention).lower(q, q, q).as_text()
    assert "flash_attention" in hlo or "custom-call" in hlo.lower()




@requires_tpu
def test_flash_grads_match_reference():
    """Backward pass of the padded+segment-id flash path (512 fwd / 256 bwd
    blocks) must match the reference attention's gradients."""
    rng = np.random.default_rng(1)
    s = 777  # pads to 1024; unaligned => segment-id masking in fwd AND bwd
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2, s, 64)), jnp.float32) for _ in range(3))
    w = jnp.asarray(rng.normal(size=(1, s, 2, 64)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(_joint_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v) * w)

    g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_r):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * scale, err_msg=name)

if __name__ == "__main__":
    test_flash_matches_reference_unaligned(777)
    test_flash_matches_reference_unaligned(2274)
    test_flash_kernel_taken_at_5b_shape()
    test_flash_grads_match_reference()
    print("flash attention tests OK")
