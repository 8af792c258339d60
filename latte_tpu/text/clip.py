"""Frozen CLIP text embedder (legacy ``extras=78`` conditioning path).

Capability parity with `/root/reference/models/clip.py:32-90`: a frozen
CLIP text encoder producing (B, 77, 768) features, wrapped by a
``TextEmbedder`` that randomly replaces prompts with the empty string for
classifier-free guidance (`clip.py:71-82`).
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


class FrozenCLIPEmbedder:
    """transformers FlaxCLIPTextModel wrapper; last_hidden_state features."""

    def __init__(self, model, params, tokenizer, max_length: int = 77):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        # params are a jit ARGUMENT: closing over the (multi-GB for XXL)
        # weight tree would bake it into the HLO as constants.
        # position_ids is REQUIRED by FlaxCLIPTextModule.__call__ (the
        # high-level wrapper normally synthesizes it; module.apply does not)
        self._encode_impl = jax.jit(
            lambda params, ids, mask: self.model.module.apply(
                {"params": params},
                input_ids=ids,
                attention_mask=mask,
                position_ids=jnp.broadcast_to(
                    jnp.arange(ids.shape[1])[None, :], ids.shape
                ),
            ).last_hidden_state
        )
        self._encode = lambda ids, mask: self._encode_impl(self.params, ids, mask)

    @classmethod
    def from_pretrained(cls, path: str, max_length: int = 77) -> "FrozenCLIPEmbedder":
        from transformers import AutoTokenizer, FlaxCLIPTextModel

        tokenizer = AutoTokenizer.from_pretrained(path)
        try:
            model = FlaxCLIPTextModel.from_pretrained(path)
        except (OSError, EnvironmentError):
            model = FlaxCLIPTextModel.from_pretrained(path, from_pt=True)
        return cls(model, model.params, tokenizer, max_length=max_length)

    def encode(self, prompts: Union[str, Sequence[str]]) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        enc = self.tokenizer(
            list(prompts),
            truncation=True,
            max_length=self.max_length,
            padding="max_length",
            return_tensors="np",
        )
        return self._encode(
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"])
        )


class TextEmbedder:
    """Prompt embedding with CFG dropout (reference `clip.py:62-90`)."""

    def __init__(self, encoder: FrozenCLIPEmbedder, dropout_prob: float = 0.1, seed: int = 0):
        self.encoder = encoder
        self.dropout_prob = dropout_prob
        self.rng = random.Random(seed)

    def token_drop(
        self, prompts: List[str], force_drop_ids: Optional[np.ndarray] = None
    ) -> List[str]:
        if force_drop_ids is not None:
            return ["" if d == 1 else p for p, d in zip(prompts, force_drop_ids)]
        return [
            "" if self.rng.random() < self.dropout_prob else p for p in prompts
        ]

    def __call__(
        self,
        prompts: Union[str, Sequence[str]],
        train: bool = False,
        force_drop_ids: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        prompts = list(prompts)
        if (train and self.dropout_prob > 0) or force_drop_ids is not None:
            prompts = self.token_drop(prompts, force_drop_ids)
        return self.encoder.encode(prompts)
