"""Validate BFS layout + serving compression at 200k (dev tool)."""
import time, os, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D, B = 200_000, 128, 4096
X = make_sift_like(N + B, D)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0 = time.time()
idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs)
print("build", round(time.time() - t0, 1), flush=True)
bj = jnp.asarray(base)
gd, gi = dist.brute_force_topk(jnp.asarray(Q[:1024]), bj, 10, dist.L2)
gi = np.asarray(gi)
del bj


def ev(tag):
    d, i = idx.search(Q[:B], 10)   # warm/compile
    t0 = time.time()
    for _ in range(3):
        d, i = idx.search(Q[:B], 10)
    dt = (time.time() - t0) / 3
    i = np.asarray(i)[:1024, :10]
    rec = np.mean([len(set(map(int, i[b])) & set(map(int, gi[b]))) / 10
                   for b in range(1024)])
    print(f"{tag}: {dt*1000:.0f} ms, {B/dt:.0f} qps, recall={rec:.4f}",
          flush=True)


ev("f32")
t0 = time.time()
idx.optimize_layout()
jax.block_until_ready(idx.state.nbrs)
print("layout", round(time.time() - t0, 1), flush=True)
ev("f32+layout")
idx.compress_serving("bfloat16")
ev("bf16+layout")
