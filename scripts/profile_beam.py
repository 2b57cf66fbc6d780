"""Beam-search perf profiling on the real chip (dev tool, not CI)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N = int(os.environ.get("PROF_N", 50_000)); D = 128
X = make_sift_like(N + 2048, D)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs); print("build", round(time.time()-t0,1), flush=True)

gd, gi = dist.brute_force_topk(jnp.asarray(Q[:1024]), idx.state.vectors[:idx.ids.capacity_used], 10, dist.L2)
gi = np.asarray(gi)
B = int(os.environ.get("PROF_B", 1024))
E = int(os.environ.get("PROF_E", 4))
EF = int(os.environ.get("PROF_EF", 100))
q = jnp.asarray(Q[:B])
t0=time.time()
d, i = K.beam_search(idx.state, q, None, metric="euclidean", ef=EF, expand=E)
jax.block_until_ready(d); print("compile+first", round(time.time()-t0,1), flush=True)
t0 = time.time()
for _ in range(5): d, i = K.beam_search(idx.state, q, None, metric="euclidean", ef=EF, expand=E)
jax.block_until_ready(d); dt = (time.time()-t0)/5
i = np.asarray(i)[:1024, :10]
rec = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(1024)])
print(f"B={B} E={E} ef={EF}: {dt*1000:.0f} ms/batch, {B/dt:.0f} qps, recall={rec:.4f}", flush=True)
