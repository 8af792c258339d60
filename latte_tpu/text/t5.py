"""Frozen T5 text encoder (Flax) for the T2V pipeline.

Fills the reference's torch `T5EncoderModel` dependency
(`/root/reference/sample/sample_t2x.py:35-36`,
`sample/pipeline_latte.py:127-285`): prompts are cleaned, tokenized to a
fixed ``max_length`` (120) and encoded with a frozen T5; instead of the
reference's variable-length "mask_feature" truncation (which fights XLA's
static shapes), we keep the padded (B, 120, D) features plus the attention
mask — the cross-attention applies the mask as an additive bias, which is
mathematically equivalent (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.utils import text_preprocessing


class T5TextEncoder:
    """Wrapper around transformers' FlaxT5EncoderModel + tokenizer."""

    def __init__(self, model, params, tokenizer, max_length: int = 120):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        # params are a jit ARGUMENT: closing over the (multi-GB for XXL)
        # weight tree would bake it into the HLO as constants
        self._encode_impl = jax.jit(
            lambda params, ids, mask: self.model.module.apply(
                {"params": params}, input_ids=ids, attention_mask=mask
            ).last_hidden_state
        )
        self._encode = lambda ids, mask: self._encode_impl(self.params, ids, mask)

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        max_length: int = 120,
        dtype: jnp.dtype = jnp.bfloat16,
    ) -> "T5TextEncoder":
        """Load from a local HF checkpoint dir (e.g. t5-v1_1-xxl).

        Torch-format weights are converted via ``from_pt=True``.
        """
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        tokenizer = AutoTokenizer.from_pretrained(path)
        try:
            model = FlaxT5EncoderModel.from_pretrained(path, dtype=dtype)
        except (OSError, EnvironmentError):
            model = FlaxT5EncoderModel.from_pretrained(path, dtype=dtype, from_pt=True)
        params = model.params
        return cls(model, params, tokenizer, max_length=max_length)

    def tokenize(
        self, prompts: Sequence[str], clean: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        prompts = [text_preprocessing(p, clean=clean) for p in prompts]
        enc = self.tokenizer(
            list(prompts),
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        return enc["input_ids"], enc["attention_mask"]

    def encode(
        self, prompts: Union[str, Sequence[str]], clean: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prompts -> (features (B, L, D), mask (B, L))."""
        if isinstance(prompts, str):
            prompts = [prompts]
        ids, mask = self.tokenize(prompts, clean=clean)
        feats = self._encode(jnp.asarray(ids), jnp.asarray(mask))
        return feats, jnp.asarray(mask)

    def encode_with_negative(
        self,
        prompts: Union[str, Sequence[str]],
        negative_prompt: str = "",
        clean: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """CFG pair encoding (reference `pipeline_latte.py:127-285`):
        returns (cond_feats, cond_mask, uncond_feats, uncond_mask)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        cond, cond_mask = self.encode(prompts, clean=clean)
        neg = [negative_prompt] * len(prompts)
        # the reference cleans the uncond tokens with the SAME flag
        # (`pipeline_latte.py:231`)
        uncond, uncond_mask = self.encode(neg, clean=clean)
        return cond, cond_mask, uncond, uncond_mask
