"""Generator hardness + refine passes vs recall."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist

def gen(n, d=128, lo=8.0, hi=14.0, seed=1234):
    rng = np.random.default_rng(seed)
    nc = max(4096, n // 64)
    centers = rng.uniform(0.0, 160.0, size=(nc, d)).astype(np.float32)
    scales = rng.uniform(lo, hi, size=(nc, 1)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    for i in range(0, n, 262144):
        m = min(262144, n - i)
        which = rng.integers(0, nc, size=m)
        noise = rng.gamma(2.0, 1.0, size=(m, d)).astype(np.float32)
        sign = rng.choice([-1.0, 1.0], size=(m, d)).astype(np.float32)
        out[i:i+m] = np.clip(centers[which] + noise*sign*scales[which], 0, 255)
    return out

N, D = 200_000, 128
X = gen(N + 2048)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs); print("build", round(time.time()-t0,1), flush=True)
B=2048
bj = jnp.asarray(base)
gd, gi = dist.brute_force_topk(jnp.asarray(Q[:B]), bj, 10, dist.L2)
gi = np.asarray(gi); del bj

def ev(tag):
    d, i = idx.search(Q[:B], 10, ef=100)
    r = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(B)])
    print(f"{tag}: recall@10={r:.4f}", flush=True)

ev("base")
t0=time.time(); idx.turbo_refine(); jax.block_until_ready(idx.state.nbrs)
print("refine1", round(time.time()-t0,1), flush=True); ev("refine x1")
t0=time.time(); idx.turbo_refine(); jax.block_until_ready(idx.state.nbrs)
print("refine2", round(time.time()-t0,1), flush=True); ev("refine x2")
