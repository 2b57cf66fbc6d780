"""MiniLM sentence encoder in pure JAX — the on-TPU local embedder.

Replaces the reference's Rust Candle ONNX embedder
(native/compute/src/embedder.rs:34-174: all-MiniLM-L6-v2, 384-d,
mean-pooled). Weights are pulled from a locally-cached HuggingFace
checkpoint (zero-egress safe: `local_files_only=True`; without a cache the
factory falls back to the hashing embedder) and converted to JAX arrays;
the forward pass is a jitted, batched BERT encoder that runs on the TPU —
no ONNX runtime, no torch in the hot path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class MiniLMEncoder:
    MAX_LEN = 256

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        self.model_name = model_name
        self._load()

    def _load(self) -> None:
        from transformers import AutoConfig, AutoModel, AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(
            self.model_name, local_files_only=True)
        cfg = AutoConfig.from_pretrained(self.model_name,
                                         local_files_only=True)
        torch_model = AutoModel.from_pretrained(self.model_name,
                                                local_files_only=True)
        sd = {k: jnp.asarray(v.detach().numpy())
              for k, v in torch_model.state_dict().items()}
        del torch_model
        self.params = sd
        self.n_layers = cfg.num_hidden_layers
        self.n_heads = cfg.num_attention_heads
        self.dim = cfg.hidden_size
        self._fwd = jax.jit(functools.partial(
            _bert_forward, n_layers=self.n_layers, n_heads=self.n_heads))

    def reload(self) -> None:
        self._load()

    def encode(self, texts: list[str]) -> np.ndarray:
        toks = self.tokenizer(texts, padding="max_length",
                              truncation=True, max_length=self.MAX_LEN,
                              return_tensors="np")
        out = self._fwd(self.params,
                        jnp.asarray(toks["input_ids"], jnp.int32),
                        jnp.asarray(toks["attention_mask"], jnp.float32))
        return np.asarray(out)


def _layer_norm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _bert_forward(p: dict[str, Any], ids: jax.Array, mask: jax.Array,
                  *, n_layers: int, n_heads: int) -> jax.Array:
    """[B, T] ids → [B, dim] mean-pooled L2-normalized embeddings."""
    B, T = ids.shape
    emb = (p["embeddings.word_embeddings.weight"][ids]
           + p["embeddings.position_embeddings.weight"][jnp.arange(T)][None]
           + p["embeddings.token_type_embeddings.weight"][0][None, None])
    x = _layer_norm(emb, p["embeddings.LayerNorm.weight"],
                    p["embeddings.LayerNorm.bias"])
    D = x.shape[-1]
    hd = D // n_heads
    att_bias = (1.0 - mask)[:, None, None, :] * -1e9

    for i in range(n_layers):
        pre = f"encoder.layer.{i}."

        def lin(name, y):
            return y @ p[pre + name + ".weight"].T + p[pre + name + ".bias"]

        q = lin("attention.self.query", x).reshape(B, T, n_heads, hd)
        k = lin("attention.self.key", x).reshape(B, T, n_heads, hd)
        v = lin("attention.self.value", x).reshape(B, T, n_heads, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) \
            / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores + att_bias, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        attn_out = lin("attention.output.dense", ctx)
        x = _layer_norm(x + attn_out,
                        p[pre + "attention.output.LayerNorm.weight"],
                        p[pre + "attention.output.LayerNorm.bias"])
        ffn = jax.nn.gelu(lin("intermediate.dense", x), approximate=False)
        ffn = lin("output.dense", ffn)
        x = _layer_norm(x + ffn, p[pre + "output.LayerNorm.weight"],
                        p[pre + "output.LayerNorm.bias"])

    # mean pooling over attention mask + L2 normalize (embedder.rs:34-174)
    m = mask[:, :, None]
    pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
