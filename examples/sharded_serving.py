"""Multi-chip serving: row-sharded index over a device mesh.

Each shard lives on its own device; queries run one SPMD program —
per-shard fused MXU scan, cross-shard all_gather top-k merge over ICI.
Index capacity scales linearly with chip count.

Run on real chips, or simulate a mesh on CPU:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_serving.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

import numpy as np
import jax

from kektordb_tpu.engine import Engine, EngineConfig

n_dev = len(jax.devices())
print(f"devices: {n_dev}")

engine = Engine(EngineConfig(start_background=False)).open()
engine.create_index("corpus", m=16, shards=n_dev)

rng = np.random.default_rng(0)
X = rng.normal(size=(4096, 64)).astype(np.float32)
engine.add_batch("corpus", [f"doc{i}" for i in range(len(X))], X,
                 metadatas=[{"lang": "en" if i % 2 else "it"}
                            for i in range(len(X))])

hits = engine.search("corpus", X[42], k=3)[0]
print("top hit:", hits[0]["id"], f"(distance {hits[0]['distance']:.3f})")

# filters translate to per-shard masks through the global row map
hits = engine.search("corpus", X[42], k=3, filter="lang = it",
                     include_metadata=True)[0]
print("filtered:", [(h["id"], h["metadata"]["lang"]) for h in hits])

# streaming adds are scan-visible immediately on their shard
engine.add("corpus", "fresh", X[0] + 50.0)
print("fresh top1:",
      engine.search("corpus", X[0] + 50.0, k=1)[0][0]["id"])

engine.close()
