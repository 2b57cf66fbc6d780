"""Sweep expand/batch at 50k, then a 1M-scale bench pass (single process)."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D = 50_000, 128
X = make_sift_like(N + 4096, D)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs); print("build50k", round(time.time()-t0,1), flush=True)

gd, gi = dist.brute_force_topk(jnp.asarray(Q[:1024]), idx.state.vectors[:idx.ids.capacity_used], 10, dist.L2)
gi = np.asarray(gi)

def run(B, E, ef, hist=0):
    q = jnp.asarray(Q[:B])
    kw = dict(metric="euclidean", ef=ef, expand=E)
    if hist: kw["history"] = hist
    d, i = K.beam_search(idx.state, q, None, **kw); jax.block_until_ready(d)
    t0 = time.time()
    for _ in range(5): d, i = K.beam_search(idx.state, q, None, **kw)
    jax.block_until_ready(d); dt = (time.time()-t0)/5
    i = np.asarray(i)[:1024, :10]
    rec = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(1024)])
    print(f"B={B} E={E} ef={ef} hist={hist}: {dt*1000:.0f} ms, {B/dt:.0f} qps, recall={rec:.4f}", flush=True)

run(1024, 8, 100)
run(1024, 4, 100, hist=256)
run(2048, 4, 100)
run(4096, 4, 100)
run(1024, 4, 64)
run(1024, 2, 100)
