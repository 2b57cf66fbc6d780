"""On-device MiniLM encoder: the JAX BERT forward, torch-free weights
loading, and the embedder factory fallbacks.

Reference analog: the Rust Candle ONNX embedder
(native/compute/src/embedder.rs:34-174 — MiniLM-L6, mean-pooled,
L2-normalized) + HF download with SHA256 (pkg/embeddings/download.go).
No pretrained checkpoint exists in this environment, so the forward is
proven end-to-end with architecture-correct random weights (shapes of
MiniLM-L6): tokenization → 6-layer attention stack → masked mean pool →
unit-norm 384-d output, running through the same jitted path production
uses."""

import hashlib
import json
import os

import numpy as np
import pytest

from kektordb_tpu.services.minilm import MiniLMEncoder
from kektordb_tpu.services import download


def _stub_tokenizer(vocab=1024, T=16):
    def tok(texts):
        ids = np.zeros((len(texts), T), np.int32)
        mask = np.zeros((len(texts), T), np.float32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: T]
            for j, w in enumerate(words):
                h = hashlib.blake2b(w.encode(), digest_size=4).digest()
                ids[i, j] = int.from_bytes(h, "little") % vocab
            mask[i, : len(words)] = 1.0
        return ids, mask
    return tok


@pytest.fixture(scope="module")
def enc():
    p = MiniLMEncoder.random_params(vocab_size=1024, dim=384, n_layers=6,
                                    n_heads=12, intermediate=1536)
    return MiniLMEncoder.from_params(p, _stub_tokenizer(), n_layers=6,
                                     n_heads=12, dim=384)


class TestBertForward:
    def test_shape_and_norm(self, enc):
        out = enc.encode(["hello world", "a vector database for agents"])
        assert out.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   rtol=1e-4)

    def test_deterministic(self, enc):
        a = enc.encode(["repeatable text"])
        b = enc.encode(["repeatable text"])
        np.testing.assert_array_equal(a, b)

    def test_batch_independence(self, enc):
        """Each row depends only on its own text (mask blocks cross-talk)."""
        solo = enc.encode(["the quick brown fox"])[0]
        batched = enc.encode(["unrelated filler", "the quick brown fox",
                              "more filler text here"])[1]
        np.testing.assert_allclose(solo, batched, atol=1e-5)

    def test_padding_invariance(self, enc):
        """Mean pooling is masked: trailing pad positions must not change
        the embedding (embedder.rs mean-pool semantics)."""
        ids, mask = _stub_tokenizer()(["short text"])
        out1 = np.asarray(enc._fwd(enc.params, ids, mask))
        ids2 = ids.copy()
        ids2[0, int(mask.sum()):] = 7   # garbage in padded slots
        out2 = np.asarray(enc._fwd(enc.params, ids2, mask))
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_distinct_texts_distinct_embeddings(self, enc):
        out = enc.encode(["alpha bravo", "totally different words"])
        assert float(np.abs(out[0] - out[1]).max()) > 1e-3


class TestWeightsDirLoad:
    def test_safetensors_roundtrip(self, tmp_path, enc):
        """Torch-free weights-dir load: save random params as safetensors +
        config + tokenizer.json, reload, identical forward output."""
        from safetensors import numpy as st_np
        from tokenizers import Tokenizer, models, pre_tokenizers

        d = str(tmp_path)
        st_np.save_file({k: np.asarray(v) for k, v in enc.params.items()},
                        os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({"num_hidden_layers": 6, "num_attention_heads": 12,
                       "hidden_size": 384}, f)
        # minimal real WordLevel tokenizer over a tiny vocab
        vocab = {"[UNK]": 0, "hello": 1, "world": 2, "vector": 3}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        tk.save(os.path.join(d, "tokenizer.json"))

        e2 = MiniLMEncoder("custom", weights_dir=d)
        out = e2.encode(["hello world", "vector hello"])
        assert out.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   rtol=1e-4)
        # same ids through both encoders -> same embedding
        ids = np.array([[1, 2]], np.int32)
        mask = np.ones((1, 2), np.float32)
        a = np.asarray(enc._fwd(enc.params, ids, mask))
        b = np.asarray(e2._fwd(e2.params, ids, mask))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_local_model_dir_detection(self, tmp_path, monkeypatch):
        monkeypatch.setenv("KEKTOR_MODEL_DIR", str(tmp_path))
        assert download.local_model_dir("org/model") is None
        d = tmp_path / "org__model"
        d.mkdir()
        for f in ("model.safetensors", "config.json", "tokenizer.json"):
            (d / f).write_bytes(b"x")
        # env is read at import time for the digest map; dir detection is live
        assert download.local_model_dir("org/model", str(tmp_path)) == str(d)

    def test_sha256_helper(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"kektordb")
        assert download.sha256_file(str(p)) == hashlib.sha256(
            b"kektordb").hexdigest()


class TestPooling:
    def test_cls_pooling_differs_and_is_normalized(self, enc):
        """bge-style CLS pooling: same weights, different pooled vector."""
        p = {k: np.asarray(v) for k, v in enc.params.items()}
        ecls = MiniLMEncoder.from_params(p, _stub_tokenizer(), n_layers=6,
                                         n_heads=12, dim=384, pooling="cls")
        a = enc.encode(["the quick brown fox"])
        b = ecls.encode(["the quick brown fox"])
        np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1.0,
                                   rtol=1e-4)
        assert float(np.abs(a - b).max()) > 1e-4

    def test_cls_ignores_mask_tail(self, enc):
        """CLS pooling reads position 0 only: masked tail garbage is
        inert (attention bias blocks it)."""
        p = {k: np.asarray(v) for k, v in enc.params.items()}
        ecls = MiniLMEncoder.from_params(p, _stub_tokenizer(), n_layers=6,
                                         n_heads=12, dim=384, pooling="cls")
        ids, mask = _stub_tokenizer()(["short text"])
        out1 = np.asarray(ecls._fwd(ecls.params, ids, mask))
        ids2 = ids.copy()
        ids2[0, int(mask.sum()):] = 9
        out2 = np.asarray(ecls._fwd(ecls.params, ids2, mask))
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_bad_pooling_rejected(self, enc):
        with pytest.raises(ValueError):
            MiniLMEncoder.from_params(
                {k: np.asarray(v) for k, v in enc.params.items()},
                _stub_tokenizer(), n_layers=6, n_heads=12, dim=384,
                pooling="max")

    def test_pooling_autodetect_from_st_config(self, tmp_path, enc):
        """sentence-transformers 1_Pooling/config.json drives the mode
        (bge ships pooling_mode_cls_token=true)."""
        from safetensors import numpy as st_np
        from tokenizers import Tokenizer, models, pre_tokenizers
        d = str(tmp_path)
        st_np.save_file({k: np.asarray(v) for k, v in enc.params.items()},
                        os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({"num_hidden_layers": 6, "num_attention_heads": 12,
                       "hidden_size": 384}, f)
        vocab = {"[UNK]": 0, "hello": 1}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        tk.save(os.path.join(d, "tokenizer.json"))
        os.mkdir(os.path.join(d, "1_Pooling"))
        with open(os.path.join(d, "1_Pooling", "config.json"), "w") as f:
            json.dump({"pooling_mode_cls_token": True,
                       "pooling_mode_mean_tokens": False}, f)
        e2 = MiniLMEncoder("custom", weights_dir=d)
        assert e2.pooling == "cls"
        e3 = MiniLMEncoder("custom", weights_dir=d, pooling="mean")
        assert e3.pooling == "mean"   # explicit arg wins


class TestGemini:
    def test_contract(self, monkeypatch):
        """embedContent payload/response contract (gemini.go:44-103)."""
        from kektordb_tpu.services.embeddings import GeminiEmbedder
        calls = []

        class _Resp:
            status_code = 200
            def raise_for_status(self):
                pass
            def json(self):
                return {"embedding": {"values": [0.6, 0.8]}}

        def fake_post(url, headers=None, timeout=None, json=None):
            calls.append((url, headers, json))
            return _Resp()

        import requests
        monkeypatch.setattr(requests, "post", fake_post)
        monkeypatch.setenv("GEMINI_API_KEY", "k123")
        e = GeminiEmbedder()
        v = e.embed("ciao")
        assert v.shape == (2,) and e.dim == 2
        url, headers, body = calls[0]
        assert url.endswith("models/gemini-embedding-001:embedContent")
        assert headers["x-goog-api-key"] == "k123"
        assert body["content"]["parts"] == [{"text": "ciao"}]
        assert body["model"] == "models/gemini-embedding-001"

    def test_error_surfaced(self, monkeypatch):
        from kektordb_tpu.services.embeddings import GeminiEmbedder

        class _Resp:
            status_code = 200
            def raise_for_status(self):
                pass
            def json(self):
                return {"error": {"message": "quota"}}

        import requests
        monkeypatch.setattr(requests, "post",
                            lambda *a, **k: _Resp())
        e = GeminiEmbedder(api_key="k")
        with pytest.raises(RuntimeError, match="quota"):
            e.embed("x")

    def test_factory_route(self):
        from kektordb_tpu.services.embeddings import (GeminiEmbedder,
                                                      select_embedder)
        assert isinstance(select_embedder("gemini", api_key="k"),
                          GeminiEmbedder)


class TestFactory:
    def test_auto_falls_back_to_hashing(self, monkeypatch):
        from kektordb_tpu.services.embeddings import select_embedder
        monkeypatch.delenv("KEKTOR_EMBEDDER_URL", raising=False)
        e = select_embedder("auto")
        # no cached checkpoint in this environment -> hashing
        assert e.name in ("hashing", "local")
        v = e.embed("agent memory")
        assert v.shape == (e.dim,)
