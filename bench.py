"""Headline benchmark: SIFT-1M-style ANN build + batched query on one TPU chip.

Reference baseline (BASELINE.md / BENCHMARKS.md:63): SIFT-1M 128d L2,
M=16 efC=200 efS=100 → recall@10 0.9906, 881 QPS, 481.4 s build on i5-12500.
Rebuild target (BASELINE.json): recall parity, ≥10× QPS (≈8810), ≥5× build
(≤96 s).

Data is synthesized SIFT-like (clustered 128-d byte-range vectors) because the
environment has no network egress; the generator is seeded and identical every
run. Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Env knobs: KEKTOR_BENCH_N (default 1_000_000), KEKTOR_BENCH_Q (10_000),
KEKTOR_BENCH_BATCH (1024 queries per device batch).
"""

import json
import os
import sys
import time

import numpy as np


def make_sift_like(n: int, d: int = 128, n_clusters: int = 2048,
                   seed: int = 1234) -> np.ndarray:
    """Clustered byte-range vectors approximating SIFT's local-descriptor
    distribution (clusters + heavy-tailed noise, clipped to [0, 255])."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.0, 160.0, size=(n_clusters, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    bs = 262_144
    for i in range(0, n, bs):
        m = min(bs, n - i)
        which = rng.integers(0, n_clusters, size=m)
        noise = rng.gamma(2.0, 12.0, size=(m, d)).astype(np.float32)
        sign = rng.choice([-1.0, 1.0], size=(m, d)).astype(np.float32)
        out[i:i + m] = np.clip(centers[which] + noise * sign, 0.0, 255.0)
    return out


def main() -> None:
    n = int(os.environ.get("KEKTOR_BENCH_N", 1_000_000))
    nq = int(os.environ.get("KEKTOR_BENCH_Q", 10_000))
    qbatch = int(os.environ.get("KEKTOR_BENCH_BATCH", 1024))
    d = 128

    import jax
    from kektordb_tpu.index import HNSWConfig, HNSWIndex
    from kektordb_tpu.ops import distance as dist

    X = make_sift_like(n + nq, d)
    base, queries = X[:n], X[n:]

    cfg = HNSWConfig(m=16, ef_construction=200, ef_search=100,
                     chunk=int(os.environ.get("KEKTOR_BENCH_CHUNK", 1024)))
    idx = HNSWIndex(d, dist.L2, config=cfg)

    # warm up compile on a throwaway prefix so build timing measures the
    # pipeline, not XLA compilation (first compile 20-40 s)
    idx._grow_for(n)
    t0 = time.time()
    idx.add_batch([f"v{i}" for i in range(n)], base)
    jax.block_until_ready(idx.state.nbrs)
    build_s = time.time() - t0

    # query: batched, one warm batch excluded from timing
    _ = idx.search(queries[:qbatch], 10)
    t0 = time.time()
    results = []
    for i in range(0, nq, qbatch):
        dd, ii = idx.search(queries[i:i + qbatch], 10)
        results.append(ii)
    qps = nq / (time.time() - t0)

    # recall@10 vs exact top-k on-device (oracle on the same chip)
    got = np.concatenate(results, axis=0)
    sample = min(nq, 2000)
    import jax.numpy as jnp
    gdd, gii = dist.brute_force_topk(
        jnp.asarray(queries[:sample]), idx.state.vectors[: idx.ids.capacity_used],
        10, dist.L2)
    gii = np.asarray(gii)
    recall = float(np.mean([
        len(set(map(int, got[b])) & set(map(int, gii[b]))) / 10
        for b in range(sample)]))

    baseline_qps = 881.0  # BENCHMARKS.md:63
    print(json.dumps({
        "metric": "SIFT1M-style 128d L2 batched query QPS "
                  "(M16 efC200 ef100, k=10)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
        "recall_at_10": round(recall, 4),
        "reference_recall_at_10": 0.9906,
        "build_s": round(build_s, 1),
        "reference_build_s": 481.4,
        "build_speedup": round(481.4 / build_s, 2),
        "n": n, "n_queries": nq, "query_batch": qbatch,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
