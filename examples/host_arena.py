"""Beyond-HBM serving on one chip: kind="host".

The arena lives in host RAM; each query batch sweeps it through the same
fused MXU scan kernel in HBM-sized chunks (async dispatch double-buffers
the host→device copy against the matmul). Capacity is bounded by host
memory — the reference's mmap-arena axis — while filters, int8
compression and checkpoints keep working.

When to use which:
  kind="hnsw"  (default)  — arena fits HBM; fastest serving
  shards=N                — arena fits N chips' combined HBM
  kind="host"             — one chip, arena bigger than HBM

Run:  python examples/host_arena.py
(CPU fallback:  JAX_PLATFORMS=cpu python examples/host_arena.py)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

import numpy as np

from kektordb_tpu.engine import Engine, EngineConfig

engine = Engine(EngineConfig(start_background=False)).open()
engine.create_index("big", kind="host", metric="cosine")
# For spectrally-decaying corpora (real embeddings), add
# serve_proj_dim=32 to sweep a [N, 32] bf16 projection instead of the
# full arena (the host arena is H2D-bound, so this multiplies
# throughput by ~D*bytes/64) with an exact full-dim re-rank on host.

rng = np.random.default_rng(0)
X = rng.normal(size=(20_000, 64)).astype(np.float32)
engine.add_batch("big", [f"doc{i}" for i in range(len(X))], X,
                 metadatas=[{"year": 2020 + i % 5} for i in range(len(X))])

# one sweep serves the whole query batch — amortize the H2D cost by
# batching queries, exactly like the serving batcher does
Q = X[:256] + 0.01
hits = engine.search("big", Q, k=3)
print("top1 of 256 queries correct:",
      sum(hits[b][0]["id"] == f"doc{b}" for b in range(256)), "/ 256")

hits = engine.search("big", X[7], k=3, filter="year >= 2023",
                     include_metadata=True)[0]
print("filtered:", [(h["id"], h["metadata"]["year"]) for h in hits])

engine.add("big", "fresh", X[0] * -1.0)
print("fresh top1:", engine.search("big", X[0] * -1.0, k=1)[0][0]["id"])
