"""Quick HTTP-path throughput check on a mid-size index (off-loop JSON)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402

from bench import _bench_http, make_sift_like  # noqa: E402
from kektordb_tpu.index import HNSWConfig, HNSWIndex  # noqa: E402
from kektordb_tpu.ops import distance as dist  # noqa: E402

N, D = 131_072, 128
X = make_sift_like(N + 8192, D)
idx = HNSWIndex(D, dist.L2,
                config=HNSWConfig(m=16, ef_construction=200, chunk=1024,
                                  serve_mode="scan"))
idx._grow_for(N)
t0 = time.time()
idx.add_batch([f"v{i}" for i in range(N)], X[:N], link=False)
jax.block_until_ready(idx.state.vectors)
print("ingest", round(time.time() - t0, 1), flush=True)
out = _bench_http(idx, X[N:], 4096)
for k, v in out.items():
    print(f"{k}: {v:.1f}")
