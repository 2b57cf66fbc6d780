"""History-size + bf16 + batch ablation at 200k."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D = 200_000, 128
X = make_sift_like(N + 4096, D)
base, Q = X[:N], X[N:]

for prec in ("float32", "bfloat16"):
    idx = HNSWIndex(D, dist.L2, precision=prec,
                    config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
    idx._grow_for(N)
    t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
    jax.block_until_ready(idx.state.nbrs)
    print(f"[{prec}] build {time.time()-t0:.1f}s", flush=True)
    gd, gi = dist.brute_force_topk(jnp.asarray(Q[:1024]),
        idx.state.vectors[:idx.ids.capacity_used].astype(jnp.float32), 10, dist.L2)
    gi = np.asarray(gi)
    def enc(q):
        return jnp.asarray(q).astype(idx.state.vectors.dtype)
    for B, E, hist in ((2048,4,0),(2048,4,64),(2048,8,64),(4096,8,64)):
        q = enc(Q[:B])
        kw = dict(metric="euclidean", ef=100, expand=E)
        if hist: kw["history"] = hist
        d, i = K.beam_search(idx.state, q, None, **kw); jax.block_until_ready(d)
        t0 = time.time()
        for _ in range(5): d, i = K.beam_search(idx.state, q, None, **kw)
        jax.block_until_ready(d); dt = (time.time()-t0)/5
        i = np.asarray(i)[:1024, :10]
        rec = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(1024)])
        print(f"[{prec}] B={B} E={E} hist={hist}: {dt*1000:.0f} ms, {B/dt:.0f} qps, recall={rec:.4f}", flush=True)
