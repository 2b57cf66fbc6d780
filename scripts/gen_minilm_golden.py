"""Generate the real-weights MiniLM golden fixture (run where egress exists).

Zero-egress environments cannot download all-MiniLM-L6-v2, so the repo
ships the PROTOCOL instead of fabricated vectors: run this script on a
networked machine and commit the resulting
`testdata/minilm_real_golden.json`; `tests/test_minilm_real.py` then
asserts the JAX forward (services/minilm.py) reproduces those embeddings
whenever real weights are present, and skips otherwise (VERDICT r2 #7 —
skipped-not-fake).

The script:
1. downloads sentence-transformers/all-MiniLM-L6-v2 (safetensors) via
   services/download.fetch_model (SHA256 logged),
2. encodes GOLDEN_SENTENCES with the repo's JAX encoder,
3. cross-checks against the published model through `transformers`
   (mean-pooled, L2-normalized — the reference embedder contract,
   native/compute/src/embedder.rs:34-174),
4. writes sentences + embeddings + the weights SHA256 to testdata/.

Usage: python scripts/gen_minilm_golden.py [out.json]
"""

import json
import os
import sys

import numpy as np

GOLDEN_SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "KektorDB is an in-memory vector database for AI agents.",
    "TPUs multiply matrices with a systolic array.",
    "La memoria episodica decade con il tempo.",
    "error: connection refused on port 9091",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "testdata",
        "minilm_real_golden.json")

    from kektordb_tpu.services import download
    from kektordb_tpu.services.minilm import MiniLMEncoder

    d = download.fetch_model()
    sha = download.sha256_file(os.path.join(d, "model.safetensors"))
    enc = MiniLMEncoder(weights_dir=d)
    ours = enc.encode(GOLDEN_SENTENCES)

    # independent oracle: upstream transformers forward, mean-pool + L2
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(
            "sentence-transformers/all-MiniLM-L6-v2")
        mdl = AutoModel.from_pretrained(
            "sentence-transformers/all-MiniLM-L6-v2")
        with torch.no_grad():
            b = tok(GOLDEN_SENTENCES, padding=True, truncation=True,
                    return_tensors="pt")
            h = mdl(**b).last_hidden_state
            m = b["attention_mask"].unsqueeze(-1).float()
            ref = (h * m).sum(1) / m.sum(1)
            ref = torch.nn.functional.normalize(ref, dim=1).numpy()
        cos = (ours * ref).sum(1)
        print("cosine(ours, transformers):", cos)
        assert (cos > 0.999).all(), "JAX forward disagrees with upstream"
    except ImportError:
        print("transformers/torch unavailable — writing OUR embeddings "
              "unverified (re-run with transformers installed to verify)")

    with open(out_path, "w") as f:
        json.dump({
            "model": "sentence-transformers/all-MiniLM-L6-v2",
            "weights_sha256": sha,
            "sentences": GOLDEN_SENTENCES,
            "embeddings": np.asarray(ours, np.float32).tolist(),
        }, f)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
