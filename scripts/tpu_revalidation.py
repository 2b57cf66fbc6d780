"""Post-recovery TPU validation — run ONCE when the tunnel answers again.

Quantifies the round-3-late changes that only matter on the chip:
  1. projected pass A at 1M x 128 (QPS vs the standard scan; recall is
     expected to be poor on this isotropic synthetic corpus — the point
     here is the HBM-traffic speedup curve, tagged as such)
  2. hybrid_qps with the vectorized BM25 (was ~3.5k host-bound)
  3. interleaved text write+query (the delta-layer fix)

Keep it SHORT (~5 min): the tunnel serializes device work and the
driver's round-end bench needs the chip. One process, one exit.

Run:  timeout 900 python scripts/tpu_revalidation.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from bench import make_sift_like
    from kektordb_tpu.index import HNSWConfig, HNSWIndex
    from kektordb_tpu.ops import distance as dist
    from kektordb_tpu.ops import scan as scanlib

    n, nq, qb, d = 1_000_000, 8192, 4096, 128
    X = make_sift_like(n + nq, d)
    base, queries = X[:n], X[n:]
    out = {}

    cfg = HNSWConfig(serve_mode="scan", chunk=1024)
    idx = HNSWIndex(d, dist.L2, config=cfg)
    idx._grow_for(n)
    t0 = time.time()
    idx.add_batch([f"v{i}" for i in range(n)], base, link=False)
    jax.block_until_ready(idx.state.vectors)
    out["stage_1m_s"] = round(time.time() - t0, 1)

    st = idx.state
    zq = jnp.zeros((qb,), jnp.float32)
    qdevs = [jnp.asarray(queries[i:i + qb]) for i in range(0, nq, qb)]

    def std_batch(qd):
        return scanlib.scan_search(st.vectors, st.norms, st.levels,
                                   st.deleted, None, qd, zq, 16,
                                   metric=dist.L2, mode="approx",
                                   has_allow=False)

    o = std_batch(qdevs[0]); jax.block_until_ready(o)
    t0 = time.time()
    outs = [std_batch(qd) for qd in qdevs]
    jax.block_until_ready(outs)
    out["scan_qps"] = round(nq / (time.time() - t0), 1)

    # forced projected path (isotropic corpus → recall will be ~0.5;
    # measuring the TRAFFIC speedup, tagged so nobody quotes it as a
    # serving operating point)
    idx.config.serve_proj_dim = 32
    idx.config.serve_proj_rerank = 64
    proj = idx._proj_arena()
    if proj is not None:
        Pa, pn = proj
        basis = idx._proj_basis

        # arena arrays must be jit ARGUMENTS: closure-captured device
        # arrays are embedded as HLO constants and the tunnel's
        # remote_compile rejects the request body with HTTP 413
        @jax.jit
        def proj_kernel(Pa_, pn_, vec_, nrm_, lev_, del_, basis_, qd):
            qp = (qd @ basis_).astype(jnp.bfloat16)
            _, rows = scanlib.scan_search(
                Pa_, pn_, lev_, del_, None, qp, zq, 64,
                metric=dist.L2, mode="approx", has_allow=False,
                fast=True)
            dd = dist.gathered(vec_, rows.astype(jnp.int32), qd,
                               dist.L2, corpus_norms=nrm_,
                               query_norms=zq)
            dd = jnp.where(rows < 0, jnp.inf, dd)
            order = jnp.argsort(dd, axis=1)[:, :10]
            return (jnp.take_along_axis(dd, order, 1),
                    jnp.take_along_axis(rows, order, 1))

        def proj_batch(qd):
            return proj_kernel(Pa, pn, st.vectors, st.norms, st.levels,
                               st.deleted, basis, qd)

        o = proj_batch(qdevs[0]); jax.block_until_ready(o)
        t0 = time.time()
        outs_p = [proj_batch(qd) for qd in qdevs]
        jax.block_until_ready(outs_p)
        out["proj32_qps_traffic_only"] = round(nq / (time.time() - t0), 1)
        out["proj32_speedup_x"] = round(
            out["proj32_qps_traffic_only"] / out["scan_qps"], 2)
    idx.config.serve_proj_dim = 0

    # hybrid through the engine (vectorized BM25)
    from kektordb_tpu.engine import Engine, EngineConfig
    eng = Engine(EngineConfig(start_background=False)).open()
    eng.create_index("r", m=16)
    eng.indexes["r"].index = idx
    words = [f"tok{j}" for j in range(512)]
    t0 = time.time()
    h = eng.indexes["r"]
    for rr in range(100_000):
        h.meta.text.add(rr, "body",
                        f"{words[rr % 512]} {words[(rr * 7) % 512]}")
    out["bm25_ingest_100k_s"] = round(time.time() - t0, 1)
    _ = eng.search("r", queries[:256], k=10, text_query="tok7 tok42",
                   alpha=0.5, decay=False)
    t0 = time.time()
    ran = 0
    for j in range(4):
        at = (j * 256) % max(len(queries) - 256, 1)
        win = queries[at:at + 256]
        _ = eng.search("r", win, k=10, text_query="tok7 tok42",
                       alpha=0.5, decay=False)
        ran += len(win)
    out["hybrid_qps"] = round(ran / (time.time() - t0), 1)

    # interleaved text write + hybrid query (delta layer)
    t0 = time.time()
    for i in range(50):
        h.meta.text.add(200_000 + i, "body", "tok7 fresh")
        _ = eng.search("r", queries[:64], k=10, text_query="tok7",
                       alpha=0.5, decay=False)
    out["interleaved_write_query_ms"] = round(
        (time.time() - t0) / 50 * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
