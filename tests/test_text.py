"""Text-encoder wrapper tests using tiny randomly-initialized HF configs."""

import numpy as np
import pytest


def make_tiny_t5():
    from transformers import FlaxT5EncoderModel, T5Config

    cfg = T5Config(
        vocab_size=100, d_model=16, d_kv=4, d_ff=32, num_layers=2, num_heads=2
    )
    return FlaxT5EncoderModel(cfg)


class FakeTokenizer:
    """Hash-based stand-in tokenizer with the HF call signature."""

    def __call__(self, texts, padding=None, max_length=None, truncation=None,
                 add_special_tokens=None, return_tensors=None):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 99 + 1 for w in t.split()][:max_length]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class TestT5Wrapper:
    def setup_method(self):
        from latte_tpu.text import T5TextEncoder

        model = make_tiny_t5()
        self.enc = T5TextEncoder(model, model.params, FakeTokenizer(), max_length=12)

    def test_encode_shapes(self):
        feats, mask = self.enc.encode(["a cat", "a dog jumping over fences"])
        assert feats.shape == (2, 12, 16)
        assert mask.shape == (2, 12)
        assert int(mask[0].sum()) == 2
        assert int(mask[1].sum()) == 5

    def test_negative_pair(self):
        c, cm, u, um = self.enc.encode_with_negative(["hello world"], "")
        assert c.shape == u.shape == (1, 12, 16)
        assert int(um.sum()) == 0  # empty negative prompt -> no tokens

    def test_caption_cleaning_applied(self):
        f1, m1 = self.enc.encode(["HELLO WORLD"])
        f2, m2 = self.enc.encode(["hello world"])
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


class TestTextEmbedderDropout:
    def test_token_drop(self):
        from latte_tpu.text.clip import TextEmbedder

        te = TextEmbedder.__new__(TextEmbedder)
        te.dropout_prob = 1.0
        import random

        te.rng = random.Random(0)
        assert te.token_drop(["a", "b"]) == ["", ""]
        assert te.token_drop(["a", "b"], force_drop_ids=np.array([1, 0])) == ["", "b"]
