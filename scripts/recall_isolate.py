"""Isolate recall loss: f32 vs bf16 serving, tie-adjusted, on new generator."""
import time, os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D = 200_000, 128
X = make_sift_like(N + 4096, D)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0=time.time(); idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs); print("build", round(time.time()-t0,1), flush=True)

B = 2048
bj = jnp.asarray(base)
gd, gi = dist.brute_force_topk(jnp.asarray(Q[:B]), bj, 10, dist.L2)
gd, gi = np.asarray(gd), np.asarray(gi)
del bj

def ev(tag, ef=100):
    d, i = idx.search(Q[:B], 10, ef=ef)
    strict = np.mean([len(set(map(int,i[b])) & set(map(int,gi[b])))/10 for b in range(B)])
    # tie/real split
    tie = real = 0
    for b in range(min(B,512)):
        want = set(map(int, gi[b])); got = set(map(int, i[b]))
        for m in want - got:
            dm = float(((Q[b]-base[m])**2).sum())
            if dm >= float(gd[b,-1]) * (1-1e-6) - 1e-2: tie += 1
            else: real += 1
    print(f"{tag} ef={ef}: strict={strict:.4f} misses(512q): tie={tie} real={real}", flush=True)

ev("f32-serve")
ev("f32-serve", ef=160)
idx.compress_serving("bfloat16")
ev("bf16-serve")
ev("bf16-serve", ef=160)
