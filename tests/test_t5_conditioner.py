"""Real-transformers path of the text conditioner.

Builds a tiny FlaxT5EncoderModel + a from-scratch WordLevel tokenizer saved
in HF format, then drives T5TextEncoder through make_text_encoder — the same
loading path a user takes with the real t5-v1_1-xxl directory (reference:
sgm/modules/encoders/modules.py FrozenT5Embedder:233)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_t5_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_t5"))
    from transformers import FlaxT5EncoderModel, T5Config

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)
    FlaxT5EncoderModel(cfg, seed=0).save_pretrained(d)

    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["<pad>", "</s>", "<unk>", "a", "smoke", "plume", "rises",
             "ball", "bounces", "the", "wind"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>", "model_max_length": 16}, f)
    return d


def test_t5_text_encoder_loads_and_encodes(tiny_t5_dir):
    from fluidnexus_tpu.diffusion.video.conditioner import T5TextEncoder, make_text_encoder

    enc = make_text_encoder(tiny_t5_dir, max_length=8, hidden=32)
    assert isinstance(enc, T5TextEncoder), "fell back to hash encoder"
    out = np.asarray(enc(["a smoke plume rises", "the ball bounces"]))
    assert out.shape == (2, 8, 32)
    assert np.isfinite(out).all()
    # deterministic + text-sensitive
    again = np.asarray(enc(["a smoke plume rises", "the ball bounces"]))
    np.testing.assert_array_equal(out, again)
    other = np.asarray(enc(["the wind", "the wind"]))
    assert np.abs(out[0] - other[0]).max() > 1e-4


def test_missing_weights_fail_loudly_without_optin():
    """A mispointed --t5_dir (or none at all) must RAISE, not silently emit
    hash pseudo-embeddings; --allow_fake_conditioning restores the fallback
    (test/smoke use). Guards the real-weights path of modules.py:233."""
    import pytest

    from fluidnexus_tpu.diffusion.video.conditioner import HashTextEncoder, make_text_encoder

    with pytest.raises(RuntimeError, match="allow_fake_conditioning"):
        make_text_encoder("/nonexistent/t5", max_length=4, hidden=16)
    with pytest.raises(RuntimeError, match="allow_fake_conditioning"):
        make_text_encoder(None, max_length=4, hidden=16)

    enc = make_text_encoder("/nonexistent/t5", max_length=4, hidden=16,
                            allow_fake=True)
    assert isinstance(enc, HashTextEncoder)
    assert np.asarray(enc(["x"])).shape == (1, 4, 16)
