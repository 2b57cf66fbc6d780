"""Build-throughput/recall tuning at 200k (dev tool)."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D = 200_000, 128
X = make_sift_like(N + 2048, D)
base, Q = X[:N], X[N:]
qj = jnp.asarray(Q[:1024])

def trial(chunk, efc, fast=False, refine_passes=0, ef_q=100):
    idx = HNSWIndex(D, dist.L2, config=HNSWConfig(
        m=16, ef_construction=efc, ef_search=ef_q, chunk=chunk))
    idx._grow_for(N)
    t0 = time.time()
    idx.add_batch([f"v{i}" for i in range(N)], base, fast=fast)
    jax.block_until_ready(idx.state.nbrs)
    for _ in range(refine_passes):
        idx.turbo_refine()
        jax.block_until_ready(idx.state.nbrs)
    bt = time.time() - t0
    idx.needs_refine = False
    gd, gi = dist.brute_force_topk(qj, idx.state.vectors[:idx.ids.capacity_used], 10, dist.L2)
    gi_np = np.asarray(gi)
    d, i = idx.search(Q[:1024], 10, ef=ef_q)
    rec = np.mean([len(set(map(int,i[b])) & set(map(int,gi_np[b])))/10 for b in range(1024)])
    t0 = time.time()
    for s in range(0, 2048, 1024):
        d, i = idx.search(Q[s:s+1024], 10, ef=ef_q)
    qps = 2048/(time.time()-t0)
    print(f"chunk={chunk} efc={efc} fast={fast} refine={refine_passes}: "
          f"build={bt:.0f}s recall={rec:.4f} qps={qps:.0f}", flush=True)

trial(1024, 200)
trial(2048, 200)
trial(2048, 128)
trial(2048, 96, fast=False, refine_passes=1)
