"""Text conditioning for the video DiT.

Parity target: CogVideoX/sgm/modules/encoders/modules.py —
GeneralConditioner:72 orchestrating FrozenT5Embedder:233 (t5-v1_1-xxl,
226 tokens, ucg_rate 0.1: the text embedding is zeroed for 10% of samples to
train the unconditional branch).

Two backends:
  - ``T5TextEncoder``: HF transformers FlaxT5EncoderModel (weights must be on
    disk — this container has no egress); tokenizer via transformers.
  - ``HashTextEncoder``: deterministic, dependency-free stand-in producing
    stable pseudo-embeddings from token hashes; used by tests and as the
    offline fallback so every pipeline stays runnable end-to-end.
"""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class HashTextEncoder:
    """Deterministic pseudo-T5: token -> seeded gaussian row. Stable across
    processes; NOT a language model (offline fallback / test double)."""

    max_length: int = 226
    hidden: int = 4096

    def __call__(self, texts):
        out = np.zeros((len(texts), self.max_length, self.hidden), np.float32)
        for i, text in enumerate(texts):
            words = str(text).split()[: self.max_length]
            for j, w in enumerate(words):
                seed = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
                out[i, j] = np.random.default_rng(seed).normal(size=self.hidden, scale=0.02)
        return jnp.asarray(out)


@dataclasses.dataclass
class T5TextEncoder:
    """FrozenT5Embedder equivalent over HF Flax weights (modules.py:233)."""

    model_dir: str
    max_length: int = 226

    def __post_init__(self):
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        self.tokenizer = AutoTokenizer.from_pretrained(self.model_dir)
        self.model = FlaxT5EncoderModel.from_pretrained(self.model_dir)

    def __call__(self, texts):
        batch = self.tokenizer(
            list(texts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=batch["input_ids"], attention_mask=batch["attention_mask"])
        return jnp.asarray(out.last_hidden_state)


def make_text_encoder(model_dir: Optional[str] = None, max_length: int = 226,
                      hidden: int = 4096, allow_fake: bool = False):
    """Real-weights T5 (modules.py:233) or — with EXPLICIT opt-in — the hash
    stand-in. A mispointed ``model_dir`` used to degrade to pseudo-embeddings
    with only a print, silently producing garbage refinements; now it raises
    unless ``allow_fake`` (the CLIs' --allow_fake_conditioning / --tiny)."""
    if model_dir:
        try:
            return T5TextEncoder(model_dir, max_length)
        except Exception as e:  # missing weights / tokenizer
            if not allow_fake:
                raise RuntimeError(
                    f"T5 weights at {model_dir!r} are unusable ({e}). Point "
                    "--t5_dir at a HF t5-v1_1-xxl directory, or pass "
                    "--allow_fake_conditioning to run with hash "
                    "pseudo-embeddings (test/smoke only — outputs will NOT "
                    "follow the prompt)") from e
            print(f"[conditioner] T5 unavailable ({e}); using hash fallback")
    elif not allow_fake:
        raise RuntimeError(
            "no T5 weights configured: pass --t5_dir <hf t5-v1_1-xxl dir>, "
            "or --allow_fake_conditioning to accept hash pseudo-embeddings "
            "(test/smoke only — outputs will NOT follow the prompt)")
    return HashTextEncoder(max_length, hidden)


def apply_ucg(text_emb, rng, ucg_rate: float = 0.1):
    """Zero whole-sample embeddings with prob ucg_rate (GeneralConditioner's
    expand_dims ucg, modules.py:72-160)."""
    keep = jax.random.bernoulli(rng, 1.0 - ucg_rate, (text_emb.shape[0],))
    return text_emb * keep[:, None, None]
