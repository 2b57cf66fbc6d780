"""Quickstart: embedded engine — create an index, insert, hybrid search.

Run: python examples/quickstart.py
(no server needed; for the HTTP flow see examples/client_quickstart.py)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

import numpy as np

from kektordb_tpu.engine import Engine, EngineConfig

engine = Engine(EngineConfig(data_dir=None, start_background=False)).open()
engine.create_index("articles", metric="cosine")

rng = np.random.default_rng(0)
docs = [
    ("a1", "JAX compiles numerical programs to XLA for TPUs"),
    ("a2", "HNSW graphs answer nearest-neighbor queries fast"),
    ("a3", "Cats sleep most of the day"),
]
for doc_id, text in docs:
    # any embedder works; the built-in hashing embedder needs no model
    from kektordb_tpu.services.embeddings import HashingEmbedder
    vec = HashingEmbedder().embed(text)
    engine.add("articles", doc_id, vec,
               {"content": text, "topic": "tech" if doc_id != "a3" else "pets",
                "_indexed_fields": ["content"]})

from kektordb_tpu.services.embeddings import HashingEmbedder
q = HashingEmbedder().embed("how do nearest neighbor searches work")
hits = engine.search("articles", q, k=2,
                     filter="topic = tech",
                     text_query="nearest neighbor",
                     alpha=0.5, include_metadata=True)[0]
for h in hits:
    print(f"{h['id']}  score={h['score']:.3f}  {h['metadata']['content']}")

# knowledge graph with time travel
engine.link("articles", "a1", "cites", "a2")
print("a1 cites:", [e["target"] for e in engine.get_edges("articles", "a1")])
engine.close()
