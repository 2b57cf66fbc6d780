"""Measure the pass-B reduction factor G on the live chip at the headline
operating point (1M x 128 f32, default serve path: fast bf16 pass A ->
exact f32 re-rank of 32 candidates).

Why: g_for() steps 8 -> 16 at 2^20 rows, and the headline bench corpus is
1,000,000 rows — just below the threshold — so it serves with G=8. NOTES.md
records pass-B IO ([B, N/G] f32+i32 write+read) as ~10 ms of the ~53 ms
batch; doubling G should halve that at a collision loss the exact re-rank
mostly absorbs. This script puts numbers on G in {8, 16, 32} so the
threshold can be set from measurement, not extrapolation.

Run: python scripts/g_sweep.py  (needs the TPU tunnel)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_sift_like
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.ops import scan as scanlib

N, D, NQ, B = 1_000_000, 128, 32768, 4096


def main() -> None:
    X = make_sift_like(N + NQ)
    base, qs = X[:N], X[N:]
    cap = ((N + 1023) // 1024) * 1024          # kernel wants 1024-row tiles
    pad = np.zeros((cap - N, D), np.float32)
    vecs = jax.device_put(jnp.asarray(np.concatenate([base, pad])))
    norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
    levels = jnp.concatenate([jnp.zeros((N,), jnp.int32),
                              jnp.full((cap - N,), -1, jnp.int32)])
    deleted = jnp.zeros((cap,), bool)
    qdev = [jax.device_put(jnp.asarray(qs[i:i + B]))
            for i in range(0, NQ, B)]
    qn = jnp.zeros((B,), jnp.float32)

    # exact oracle, first batch only (recall sample = 4096 queries)
    od, orows = scanlib.scan_search(
        vecs, norms, levels, deleted, None, qdev[0], qn, 10,
        metric=dist.L2, mode="exact")
    gt = np.asarray(orows)[:, :10]
    print("oracle ready", flush=True)

    orig = scanlib.g_for
    try:
        for G in (8, 16, 32):
            scanlib.g_for = (lambda n, G=G: G)
            jax.clear_caches()

            def f(q):
                return scanlib.scan_search(
                    vecs, norms, levels, deleted, None, q, qn, 32,
                    metric=dist.L2, mode="approx")

            jax.block_until_ready(f(qdev[0]))   # compile
            jax.block_until_ready(f(qdev[1]))   # dispatch tail
            jax.block_until_ready(f(qdev[2]))
            t0 = time.time()
            outs = [f(q) for q in qdev]
            jax.block_until_ready(outs)
            qps = NQ / (time.time() - t0)
            got = np.asarray(outs[0][1])[:, :10]
            rec = float(np.mean([len(set(map(int, got[b])) &
                                     set(map(int, gt[b]))) / 10
                                 for b in range(B)]))
            print(f"G={G:2d}  qps={qps:9.1f}  recall@10={rec:.4f}",
                  flush=True)
    finally:
        scanlib.g_for = orig


if __name__ == "__main__":
    main()
