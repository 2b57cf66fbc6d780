"""Cross-framework BERT parity: the JAX encoder vs torch transformers.

The zero-egress environment can't download the published MiniLM
checkpoint (tests/test_minilm_real.py stays the real-weights gate, and
skips honestly until weights exist). THIS test closes the architecture/
numerics half of that gap in a way that ALWAYS runs: build a tiny seeded
`transformers.BertModel` in-process — the canonical implementation the
published checkpoints were trained with — load the SAME weights into the
repo's JAX forward (services/minilm._bert_forward), and require the
mean-pooled, L2-normalized embeddings to agree. Any deviation in
attention layout, LayerNorm epsilon, GELU flavor, pooling, or weight
transposition fails here without any download.

Reference contract: native/compute/src/embedder.rs:34-174 (mean pool +
L2 normalize over the attention mask).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_bert(seed=0, vocab=211, dim=64, layers=2, heads=4, ffn=128,
               max_pos=64):
    torch.manual_seed(seed)
    cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=dim, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=ffn,
        max_position_embeddings=max_pos, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return transformers.BertModel(cfg).eval(), cfg


def _torch_embed(model, ids, mask, pooling="mean"):
    with torch.no_grad():
        out = model(input_ids=torch.as_tensor(ids),
                    attention_mask=torch.as_tensor(mask)).last_hidden_state
    if pooling == "cls":
        pooled = out[:, 0]
    else:
        m = torch.as_tensor(mask, dtype=out.dtype)[:, :, None]
        pooled = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
    pooled = pooled / pooled.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    return pooled.numpy()


@pytest.mark.parametrize("pooling", ["mean", "cls"])
def test_jax_forward_matches_transformers(pooling):
    from kektordb_tpu.services.minilm import MiniLMEncoder

    model, cfg = _tiny_bert()
    params = {k: v.detach().numpy() for k, v in model.state_dict().items()
              if not k.startswith("pooler.")}
    rng = np.random.default_rng(5)
    B, T = 4, 18
    ids = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)
    mask[1, 9:] = 0.0            # ragged batch exercises masked pooling
    mask[3, 4:] = 0.0

    enc = MiniLMEncoder.from_params(
        params, lambda texts: (ids, mask),
        n_layers=cfg.num_hidden_layers,
        n_heads=cfg.num_attention_heads,
        dim=cfg.hidden_size, pooling=pooling)
    ours = enc.encode(["x"] * B)
    want = _torch_embed(model, ids, mask, pooling)
    cos = (ours * want).sum(axis=1)
    assert (cos > 0.9999).all(), cos
    assert np.abs(ours - want).max() < 2e-4


def test_masked_positions_do_not_leak():
    """Changing PAD-position ids must not change the embedding (the mask
    must gate both attention and pooling)."""
    from kektordb_tpu.services.minilm import MiniLMEncoder

    model, cfg = _tiny_bert(seed=1)
    params = {k: v.detach().numpy() for k, v in model.state_dict().items()
              if not k.startswith("pooler.")}
    ids = np.array([[5, 6, 7, 8, 9, 10, 11, 12]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.float32)
    ids2 = ids.copy()
    ids2[0, 4:] = 99

    def run(i):
        enc = MiniLMEncoder.from_params(
            params, lambda texts: (i, mask),
            n_layers=cfg.num_hidden_layers,
            n_heads=cfg.num_attention_heads, dim=cfg.hidden_size)
        return enc.encode(["x"])

    a, b = run(ids), run(ids2)
    assert np.allclose(a, b, atol=1e-5)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
