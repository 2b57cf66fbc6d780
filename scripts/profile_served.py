"""Where do Engine.search's ~170ms/2048-query batches go? (cProfile)"""
import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402

from bench import make_sift_like  # noqa: E402
from kektordb_tpu.engine import Engine, EngineConfig  # noqa: E402
from kektordb_tpu.index import HNSWConfig, HNSWIndex  # noqa: E402
from kektordb_tpu.ops import distance as dist  # noqa: E402

N, D, B = 131_072, 128, 2048
X = make_sift_like(N + 4 * B, D)
idx = HNSWIndex(D, dist.L2,
                config=HNSWConfig(m=16, ef_construction=200, chunk=1024,
                                  serve_mode="scan"))
idx._grow_for(N)
idx.add_batch([f"v{i}" for i in range(N)], X[:N], link=False)
jax.block_until_ready(idx.state.vectors)

eng = Engine(EngineConfig(start_background=False)).open()
eng.create_index("bench", m=16)
eng.indexes["bench"].index = idx
Q = X[N:]
_ = eng.search("bench", Q[:B], k=10, decay=False, columnar=True)

t0 = time.time()
for j in range(4):
    _ = eng.search("bench", Q[j * B:(j + 1) * B], k=10, decay=False,
                   columnar=True)
dt = time.time() - t0
print(f"columnar: {4*B/dt:.0f} qps ({dt/4*1000:.0f} ms/batch)", flush=True)

pr = cProfile.Profile()
pr.enable()
for j in range(4):
    _ = eng.search("bench", Q[j * B:(j + 1) * B], k=10, decay=False,
                   columnar=True)
pr.disable()
stats = pstats.Stats(pr)
stats.sort_stats("cumulative").print_stats(28)
