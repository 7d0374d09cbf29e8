"""CLIP text encoder wrapper (conditional path).

Uses the transformers Flax CLIP text model (the reference loads the torch
CLIPTextModel from the SD checkpoint, viallanDiffusion_conditional.py:
1249-1251).  Weights resolve from a local directory ($VILLAN_PRETRAINED/
<model>/text_encoder with flax msgpack or torch bin); a tiny random-init
config backs tests and dry runs (no network egress here).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TextEncoderBundle:
    model: object          # FlaxCLIPTextModule
    params: dict
    hidden_size: int

    def encode_with(self, params, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Like ``encode`` but with explicit params, for jitted consumers —
        closing over the 49408-row embedding table bakes it into the HLO as
        literal constants (~400 MB of payload for the SD text encoder)."""
        ids = jnp.asarray(input_ids)
        mask = jnp.ones_like(ids)
        pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None, :], ids.shape)
        out = self.model.apply(
            {"params": params}, ids, mask, pos, deterministic=True
        )
        return out.last_hidden_state

    def encode(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, T) int32 token ids -> (B, T, hidden) last_hidden_state."""
        return self.encode_with(self.params, input_ids)


def make_tiny_text_encoder(
    hidden_size: int = 32,
    vocab_size: int = 49408,
    max_length: int = 77,
    rng: Optional[jax.Array] = None,
) -> TextEncoderBundle:
    """Random-init CLIP-text at smoke-test scale.

    vocab_size must cover the tokenizer's id range (HashTokenizer emits the
    CLIP range, 49408): flax nn.Embed lowers out-of-range ids to a
    NaN-filling jnp.take, which poisons every downstream loss."""
    from transformers import CLIPTextConfig
    from transformers.models.clip.modeling_flax_clip import FlaxCLIPTextModule

    config = CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=hidden_size * 4,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=max_length,
    )
    module = FlaxCLIPTextModule(config=config, dtype=jnp.float32)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    ids = jnp.zeros((1, max_length), jnp.int32)
    mask = jnp.ones_like(ids)
    pos = jnp.broadcast_to(jnp.arange(max_length)[None, :], ids.shape)
    params = jax.jit(
        lambda r, i, m, p: module.init(r, i, m, p, deterministic=True)
    )(rng, ids, mask, pos)["params"]
    return TextEncoderBundle(model=module, params=params, hidden_size=hidden_size)


def load_text_encoder(model_dir: str) -> TextEncoderBundle:
    """Load a CLIP text encoder from a local SD checkpoint directory."""
    from transformers import CLIPTextConfig, FlaxCLIPTextModel

    te_dir = os.path.join(model_dir, "text_encoder")
    if not os.path.isdir(te_dir):
        raise FileNotFoundError(
            f"No text_encoder/ under {model_dir!r}; SD checkpoints must be on "
            "local disk (no network access in this environment)."
        )
    model = FlaxCLIPTextModel.from_pretrained(te_dir, from_pt=True)
    return TextEncoderBundle(
        model=model.module,
        params=model.params["params"] if "params" in model.params else model.params,
        hidden_size=model.config.hidden_size,
    )


def get_tokenizer(model_dir: Optional[str] = None):
    """CLIPTokenizer from a local dir, else the deterministic hash fallback."""
    if model_dir is not None:
        tok_dir = os.path.join(model_dir, "tokenizer")
        if os.path.isdir(tok_dir):
            from transformers import CLIPTokenizer

            return CLIPTokenizer.from_pretrained(tok_dir)
    from villandiffusion_tpu.data.caption_loader import HashTokenizer

    return HashTokenizer()
