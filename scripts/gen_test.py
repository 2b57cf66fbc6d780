"""Generator degeneracy test: cluster density vs tie-rate/strict recall."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist

def gen(n, nc_div, d=128, lo=8.0, hi=14.0, seed=1234):
    rng = np.random.default_rng(seed)
    nc = max(4096, n // nc_div)
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

N, D, B = 200_000, 128, 1024
for nc_div in (8, 4):
    X = gen(N + B, nc_div)
    base, Q = X[:N], X[N:]
    idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
    idx._grow_for(N)
    t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
    jax.block_until_ready(idx.state.nbrs)
    bj = jnp.asarray(base)
    gd, gi = dist.brute_force_topk(jnp.asarray(Q[:B]), bj, 10, dist.L2)
    gd, gi = np.asarray(gd), np.asarray(gi); del bj
    d, i = idx.search(Q[:B], 10, ef=100)
    strict = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(B)])
    eps_hit = ((np.asarray(d) <= (gd[:, -1] * (1+1e-3))[:, None]) & (np.asarray(i) >= 0)).mean()
    tie = real = 0
    for b in range(512):
        want = set(map(int, gi[b])); got = set(map(int, i[b]))
        for m in want - got:
            dm = float(((Q[b]-base[m])**2).sum())
            if dm <= float(gd[b,-1]) * (1+1e-3): tie += 1
            else: real += 1
    print(f"nc_div={nc_div} build={time.time()-t0:.0f}s strict={strict:.4f} "
          f"eps_recall={eps_hit:.4f} misses512: tie={tie} real={real}", flush=True)
