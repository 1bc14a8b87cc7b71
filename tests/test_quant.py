"""QLoRA-style int8 base weights for the video DiT (base_quant=True).

The fit-on-one-chip recipe for the flagship 5B LoRA finetune: the frozen
block matmul kernels (qkv/out/fc1/fc2 + adaLN) are stored int8 with a
per-output-column f32 scale (y = (x @ q) * scale — exact for per-column
scales). The reference finetunes the same recipe at bf16 on 80 GiB A100s
(configs/sft_pi2v_fluid_nexus_smoke.yaml); int8 is the TPU single-16GiB-chip
equivalent. These tests bound the int8 numerics delta and check the
converter's layout; the real-5B memory/execution proof is the standalone
tests/test_5b_lora_train_smoke.py TPU lane.
"""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnexus_tpu.diffusion.video.dit import (
    VideoDiT, VideoDiTConfig, quantize_dit_params)

TINY = VideoDiTConfig(
    hidden_size=64, num_layers=2, num_heads=4, patch_size=2, in_channels=4,
    out_channels=4, text_hidden_size=32, text_length=5, latent_frames=3,
    latent_height=8, latent_width=8, dtype=jnp.float32, lora_rank=4)


def _unbox(t):
    import flax.linen as nn

    return jax.tree.map(lambda v: v.unbox() if isinstance(v, nn.meta.AxisMetadata) else v,
                        t, is_leaf=lambda v: isinstance(v, nn.meta.AxisMetadata))


def _setup():
    m = VideoDiT(TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 8, 8))
    t = jnp.array([500], jnp.int32)
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
    params = _unbox(m.init(jax.random.PRNGKey(2), x, t, txt)["params"])

    # randomize the zero-init adaLN kernels so their quantization is exercised
    k = [10]
    def rnd(tree):
        for name, v in tree.items():
            if name == "adaLN":
                k[0] += 1
                v["kernel"] = 0.02 * np.random.default_rng(k[0]).normal(
                    size=v["kernel"].shape).astype(np.float32)
            elif isinstance(v, dict):
                rnd(v)
    rnd(params)
    return m, params, (x, t, txt)


def test_int8_forward_close_to_float():
    m, params, args = _setup()
    ref = m.apply({"params": params}, *args)
    qp = quantize_dit_params(params)
    mq = VideoDiT(dc.replace(TINY, base_quant=True))
    out = mq.apply({"params": qp}, *args)
    rel = float(jnp.abs(out - ref).max()) / float(jnp.abs(ref).max())
    assert rel < 0.01, rel


def test_int8_loss_delta_bounded():
    """The VERDICT-required bound: int8 loss vs float loss on the engine's
    training objective differs by < 2% relative."""
    from fluidnexus_tpu.diffusion.video.engine import VideoEngine

    _, params, (x, t, txt) = _setup()
    eng_f = VideoEngine(TINY, fixed_frames=1)
    eng_q = VideoEngine(dc.replace(TINY, base_quant=True), fixed_frames=1)
    qp = quantize_dit_params(params)
    rng = jax.random.PRNGKey(7)
    lf, _ = eng_f.loss_fn(params, x, txt, rng)
    lq, _ = eng_q.loss_fn(qp, x, txt, rng)
    assert abs(float(lf) - float(lq)) / max(abs(float(lf)), 1e-8) < 0.02, (float(lf), float(lq))


def test_quantize_layout_matches_quant_init():
    """Converter output has EXACTLY the tree structure base_quant=True
    initializes (so ported checkpoints drop in), lora/bias leaves unchanged,
    int8 dtype + per-column scale shapes."""
    m, params, (x, t, txt) = _setup()
    qp = quantize_dit_params(params)
    mq = VideoDiT(dc.replace(TINY, base_quant=True))
    init_q = _unbox(mq.init(jax.random.PRNGKey(2), x, t, txt)["params"])
    assert (jax.tree_util.tree_structure(qp)
            == jax.tree_util.tree_structure(init_q))

    blk = qp["block_0"]["attn"]["qkv"]
    assert blk["kernel_q"].dtype == jnp.int8
    assert blk["kernel_scale"].shape == (blk["kernel_q"].shape[1],)
    np.testing.assert_array_equal(np.asarray(blk["lora_a"]),
                                  np.asarray(params["block_0"]["attn"]["qkv"]["lora_a"]))
    # round-trip dequant ~= original kernel
    w = np.asarray(params["block_0"]["attn"]["qkv"]["kernel"])
    wq = np.asarray(blk["kernel_q"], np.float32) * np.asarray(blk["kernel_scale"])[None, :]
    assert np.max(np.abs(w - wq)) <= np.max(np.abs(w)) / 127.0 * 1.01


@pytest.mark.slow
def test_int8_lora_grads_flow():
    """grad w.r.t. the lora subtree works through the int8 base matmuls
    (the partitioned-LoRA train path of train_video with --quant_base)."""
    from fluidnexus_tpu.diffusion.video.engine import (
        VideoEngine, lora_merge, lora_partition)

    _, params, (x, t, txt) = _setup()
    qp = quantize_dit_params(params)
    eng = VideoEngine(dc.replace(TINY, base_quant=True), fixed_frames=1)
    lp, bp = lora_partition(qp)
    g = jax.grad(lambda q: eng.loss_fn(lora_merge(q, bp), x, txt,
                                       jax.random.PRNGKey(3))[0])(lp)
    leaves = [np.abs(np.asarray(v)).max() for v in jax.tree.leaves(g)]
    assert leaves and any(v > 0 for v in leaves)
