"""Surgical beam-loop ablation at 1M: which per-iteration op dominates.

Variants (all fixed at max_iters=48, E=8, ef=100, B=4096, bf16 arena):
  full        the production loop
  no_dedup    skip all structural dedup masks
  no_gather   skip the vector gather (constant distances)
  no_topk     replace the pool-merge top_k with a truncation
"""
import time, os, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D, B = int(os.environ.get("AB_N", 1_000_000)), 128, 4096
X = make_sift_like(N + B, D)
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200,
                                              chunk=1024))
idx._grow_for(N)
t0 = time.time()
idx.add_batch([f"v{i}" for i in range(N)], X[:N])
jax.block_until_ready(idx.state.nbrs)
print("build", round(time.time() - t0, 1), flush=True)
idx.compress_serving("bfloat16")
state = idx.state
q, qn = idx._encode(X[N:])

EF, E, ITERS = 100, 8, 48
M0 = state.nbrs.shape[1]
C = E * M0
R = 128


@functools.partial(jax.jit, static_argnames=("variant",))
def loop(state, q, qn, variant):
    B = q.shape[0]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    start = K.descend(state, q, qn, "euclidean")
    seeds = start[:, None]
    seed_d = K._gathered(state, seeds, q, qn, "euclidean")

    def merge(pd, pi, px, nd, ni):
        if variant == "twolevel":
            # prune new candidates to 48 first (small-k top_k), then merge
            tnd, tpos = jax.lax.top_k(-nd, 48)
            nd = -tnd
            ni = jnp.take_along_axis(ni, tpos, 1)
        ad = jnp.concatenate([pd, nd], axis=1)
        ai = jnp.concatenate([pi, ni], axis=1)
        ax = jnp.concatenate([px, jnp.zeros_like(ni, bool)], axis=1)
        if variant == "no_topk":
            return ad[:, :EF], ai[:, :EF], ax[:, :EF]
        if variant in ("sortmerge", "no_gather", "no_dedup"):
            # full sort carrying payloads, then truncate
            key = ad
            payload = (ai, ax.astype(jnp.int32))
            sd, si, sx = jax.lax.sort((key,) + payload, num_keys=1)
            return sd[:, :EF], si[:, :EF], sx[:, :EF].astype(bool)
        td, pos = jax.lax.top_k(-ad, EF)
        return (-td, jnp.take_along_axis(ai, pos, 1),
                jnp.take_along_axis(ax, pos, 1))

    pd = jnp.full((B, EF), jnp.inf, jnp.float32)
    pi = jnp.full((B, EF), -1, jnp.int32)
    px = jnp.zeros((B, EF), bool)
    pd, pi, px = merge(pd, pi, px, seed_d, seeds)
    hist = jnp.full((B, R), -1, jnp.int32)

    def body(it, carry):
        hist, pd, pi, px = carry
        ud = jnp.where(px | (pi < 0), jnp.inf, pd)
        neg, pos = jax.lax.top_k(-ud, E)
        sel_i = jnp.take_along_axis(pi, pos, 1)
        px2 = px.at[bidx, pos].set(True)
        hist2 = jax.lax.dynamic_update_slice(hist, sel_i, (0, (it * E) % R))
        nb = state.nbrs[jnp.maximum(sel_i, 0)].reshape(B, C)
        nb = jnp.where((sel_i >= 0).repeat(M0, axis=1), nb, -1)
        if variant != "no_dedup":
            dup = jnp.any(nb[:, :, None] == pi[:, None, :], axis=2)
            dup |= jnp.any(nb[:, :, None] == hist2[:, None, :], axis=2)
            eq = nb[:, :, None] == nb[:, None, :]
            tri = jnp.tril(jnp.ones((C, C), bool), k=-1)
            dup |= jnp.any(eq & tri[None], axis=2)
            nb = jnp.where(dup, -1, nb)
        if variant == "no_gather":
            nd = jnp.where(nb >= 0, 1.0 + it * 0.001
                           + jnp.arange(C, dtype=jnp.float32)[None, :],
                           jnp.inf)
        else:
            nd = K._gathered(state, nb, q, qn, "euclidean")
        pd2, pi2, px3 = merge(pd, pi, px2, nd, nb)
        return (hist2, pd2, pi2, px3)

    hist, pd, pi, px = jax.lax.fori_loop(0, ITERS, body,
                                         (hist, pd, pi, px))
    return pd, pi


gd, gi = dist.brute_force_topk(
    jnp.asarray(X[N:N + 512]), state.vectors[:N].astype(jnp.float32), 10,
    "euclidean")
gi = np.asarray(gi)

for variant in ("sortmerge", "no_gather", "no_dedup"):
    d, i = loop(state, q, qn, variant)
    jax.block_until_ready(d)
    t0 = time.time()
    for _ in range(3):
        d, i = loop(state, q, qn, variant)
    jax.block_until_ready(d)
    dt = (time.time() - t0) / 3
    i_np = np.asarray(i)[:512, :10]
    rec = np.mean([len(set(map(int, i_np[b])) & set(map(int, gi[b]))) / 10
                   for b in range(512)])
    print(f"{variant:10s}: {dt*1000:7.0f} ms  ({dt/ITERS*1000:5.1f} ms/iter) "
          f"recall={rec:.4f}", flush=True)
