"""BERT-family sentence encoder in pure JAX — the on-TPU local embedder.

Replaces the reference's Rust Candle ONNX embedder
(native/compute/src/embedder.rs:34-174: all-MiniLM-L6-v2, 384-d,
mean-pooled), generalized to any BERT-architecture sentence-transformers
checkpoint (all-MiniLM-*, bge-small/base, gte-small/base, e5-small/base,
paraphrase-*): layer count / head count / width come from config.json,
pooling mode (mean vs CLS) from the sentence-transformers
1_Pooling/config.json when present. Weights are pulled from a
locally-cached HuggingFace checkpoint (zero-egress safe:
`local_files_only=True`; without a cache the factory falls back to the
hashing embedder) and converted to JAX arrays; the forward pass is a
jitted, batched BERT encoder that runs on the TPU — no ONNX runtime, no
torch in the hot path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class MiniLMEncoder:
    MAX_LEN = 256

    def __init__(self,
                 model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 weights_dir: str | None = None,
                 pooling: str | None = None):
        """weights_dir: a directory with {model.safetensors, config.json,
        tokenizer.json} (the output of services.download.fetch_model) —
        loaded torch-free via safetensors+tokenizers. Without it, falls back
        to a locally-cached HF checkpoint (zero-egress safe).

        pooling: "mean" (MiniLM/e5/gte) or "cls" (bge); None auto-detects
        from the checkpoint's sentence-transformers 1_Pooling/config.json
        and defaults to "mean"."""
        self.model_name = model_name
        self.weights_dir = weights_dir
        self.pooling = pooling
        self._load()

    def _load(self) -> None:
        if self.weights_dir:
            self._load_from_dir(self.weights_dir)
        else:
            self._load_from_hf_cache()
        if self.pooling is None:
            self.pooling = "mean"
        if self.pooling not in ("mean", "cls"):
            raise ValueError(f"unknown pooling {self.pooling!r}")
        self._fwd = jax.jit(functools.partial(
            _bert_forward, n_layers=self.n_layers, n_heads=self.n_heads,
            pooling=self.pooling))

    def _load_from_dir(self, d: str) -> None:
        """Torch-free load path: safetensors weights + tokenizers tokenizer
        (the analogue of the reference's Candle loader, embedder.rs:34-74)."""
        import json
        import os

        from safetensors import numpy as st_np
        from tokenizers import Tokenizer

        with open(os.path.join(d, "config.json")) as f:
            cfg = json.load(f)
        if self.pooling is None:
            # sentence-transformers checkpoints record the pooling head in
            # 1_Pooling/config.json (bge = CLS, MiniLM/e5/gte = mean)
            pool_cfg = os.path.join(d, "1_Pooling", "config.json")
            if os.path.exists(pool_cfg):
                with open(pool_cfg) as f:
                    pc = json.load(f)
                if pc.get("pooling_mode_cls_token"):
                    self.pooling = "cls"
                elif pc.get("pooling_mode_mean_tokens"):
                    self.pooling = "mean"
        raw = st_np.load_file(os.path.join(d, "model.safetensors"))
        self.params = {k: jnp.asarray(v) for k, v in raw.items()}
        tk = Tokenizer.from_file(os.path.join(d, "tokenizer.json"))
        tk.enable_truncation(self.MAX_LEN)
        tk.enable_padding(length=None)   # pad to longest in batch
        self._hf_tokenizer = None
        self._tk = tk
        self.n_layers = cfg["num_hidden_layers"]
        self.n_heads = cfg["num_attention_heads"]
        self.dim = cfg["hidden_size"]

    def _load_from_hf_cache(self) -> None:
        from transformers import AutoConfig, AutoModel, AutoTokenizer
        self._hf_tokenizer = AutoTokenizer.from_pretrained(
            self.model_name, local_files_only=True)
        self._tk = None
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

    @classmethod
    def from_params(cls, params: dict, tokenize_fn, *, n_layers: int,
                    n_heads: int, dim: int,
                    pooling: str = "mean") -> "MiniLMEncoder":
        """Build from explicit params + tokenizer callable (tests /
        programmatic weights). tokenize_fn(texts) must return
        (input_ids [B,T] int32, attention_mask [B,T] f32)."""
        if pooling not in ("mean", "cls"):
            raise ValueError(f"unknown pooling {pooling!r}")
        self = cls.__new__(cls)
        self.model_name = "custom"
        self.weights_dir = None
        self.pooling = pooling
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self._hf_tokenizer = None
        self._tk = None
        self._custom_tokenize = tokenize_fn
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.dim = dim
        self._fwd = jax.jit(functools.partial(
            _bert_forward, n_layers=n_layers, n_heads=n_heads,
            pooling=pooling))
        return self

    @staticmethod
    def random_params(vocab_size: int = 1024, dim: int = 384,
                      n_layers: int = 6, n_heads: int = 12,
                      intermediate: int = 1536, max_pos: int = 512,
                      seed: int = 0) -> dict:
        """Architecture-correct random weights (MiniLM-L6 shapes by
        default) — proves the on-device forward end-to-end without the
        pretrained checkpoint (zero-egress environments)."""
        rng = np.random.default_rng(seed)

        def w(*shape):
            return (rng.normal(size=shape) * 0.02).astype(np.float32)

        p = {
            "embeddings.word_embeddings.weight": w(vocab_size, dim),
            "embeddings.position_embeddings.weight": w(max_pos, dim),
            "embeddings.token_type_embeddings.weight": w(2, dim),
            "embeddings.LayerNorm.weight": np.ones(dim, np.float32),
            "embeddings.LayerNorm.bias": np.zeros(dim, np.float32),
        }
        for i in range(n_layers):
            pre = f"encoder.layer.{i}."
            for nm, shape in (
                    ("attention.self.query", (dim, dim)),
                    ("attention.self.key", (dim, dim)),
                    ("attention.self.value", (dim, dim)),
                    ("attention.output.dense", (dim, dim)),
                    ("intermediate.dense", (intermediate, dim)),
                    ("output.dense", (dim, intermediate))):
                p[pre + nm + ".weight"] = w(*shape)
                p[pre + nm + ".bias"] = np.zeros(shape[0], np.float32)
            for nm in ("attention.output.LayerNorm", "output.LayerNorm"):
                p[pre + nm + ".weight"] = np.ones(dim, np.float32)
                p[pre + nm + ".bias"] = np.zeros(dim, np.float32)
        return p

    def reload(self) -> None:
        self._load()

    def _tokenize(self, texts: list[str]):
        if getattr(self, "_custom_tokenize", None) is not None:
            return self._custom_tokenize(texts)
        if self._tk is not None:
            encs = self._tk.encode_batch(texts)
            T = max(len(e.ids) for e in encs)
            ids = np.zeros((len(encs), T), np.int32)
            mask = np.zeros((len(encs), T), np.float32)
            for i, e in enumerate(encs):
                ids[i, : len(e.ids)] = e.ids
                mask[i, : len(e.ids)] = e.attention_mask[: len(e.ids)]
            return ids, mask
        toks = self._hf_tokenizer(texts, padding="max_length",
                                  truncation=True, max_length=self.MAX_LEN,
                                  return_tensors="np")
        return (toks["input_ids"].astype(np.int32),
                toks["attention_mask"].astype(np.float32))

    def encode(self, texts: list[str]) -> np.ndarray:
        ids, mask = self._tokenize(texts)
        # pad T to a power of two so repeated lengths share compiled programs
        T = ids.shape[1]
        Tp = 8
        while Tp < T:
            Tp *= 2
        Tp = min(Tp, self.MAX_LEN)
        if Tp > T:
            ids = np.pad(ids, ((0, 0), (0, Tp - T)))
            mask = np.pad(mask, ((0, 0), (0, Tp - T)))
        elif Tp < T:
            ids, mask = ids[:, :Tp], mask[:, :Tp]
        out = self._fwd(self.params, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.float32))
        return np.asarray(out)


def _layer_norm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _bert_forward(p: dict[str, Any], ids: jax.Array, mask: jax.Array,
                  *, n_layers: int, n_heads: int,
                  pooling: str = "mean") -> jax.Array:
    """[B, T] ids → [B, dim] pooled L2-normalized embeddings."""
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

    # pooling + L2 normalize: mean over the attention mask (MiniLM/e5/gte,
    # embedder.rs:34-174) or the [CLS] token (bge family)
    if pooling == "cls":
        pooled = x[:, 0]
    else:
        m = mask[:, :, None]
        pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
