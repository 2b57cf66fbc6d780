"""Nav-table beam at 1M: contiguous [cap, W] narrow array vs full-width.

Round-1 finding: slicing nbrs[:, :W] hits a slow strided-gather path; this
tests the separate-narrow-array fix (full-row gathers from [cap, W])."""
import time, os, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D, B = 1_000_000, 128, 4096
X = make_sift_like(N + B, D)
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0 = time.time(); idx.add_batch([f"v{i}" for i in range(N)], X[:N])
np.asarray(idx.state.size); print("build", round(time.time() - t0, 1), flush=True)
state = idx.state
q, qn = idx._encode(X[N:])
gd, gi = dist.brute_force_topk(jnp.asarray(X[N:N+1024]), state.vectors[:N].astype(jnp.float32), 10, "euclidean")
gi = np.asarray(gi)

for W, ef, E in ((0, 100, 4), (16, 100, 4), (16, 100, 8), (16, 128, 4),
                 (12, 100, 4), (16, 160, 4)):
    kw = dict(metric="euclidean", ef=ef, expand=E)
    nav = None
    if W:
        nav = state.nbrs[:, :W]
        kw["nav"] = nav
    d, i = K.beam_search(state, q, qn, **kw)
    _ = np.asarray(d[0, 0])
    t0 = time.time()
    for _2 in range(3):
        d, i = K.beam_search(state, q, qn, **kw)
        _ = np.asarray(d[0, 0])
    dt = (time.time() - t0) / 3
    i_np = np.asarray(i)[:1024, :10]
    rec = np.mean([len(set(map(int, i_np[b])) & set(map(int, gi[b]))) / 10
                   for b in range(1024)])
    print(f"W={W} ef={ef} E={E}: {dt*1000:.0f} ms, {B/dt:.0f} qps, recall={rec:.4f}", flush=True)
