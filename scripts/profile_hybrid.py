"""Stage-by-stage timing of the hybrid/filtered serving path on the real
chip. Fabricates a 1M-row scan-servable index (scan serving reads only
vectors/norms/levels/deleted — links are irrelevant), then times:

  raw scan_search | idx.search | engine hybrid | engine filtered |
  BM25 host scoring | fused assembly | 1M-bool mask upload

Run:  python scripts/profile_hybrid.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist

N, D, B = 1_000_000, 128, 256


def fabricate(n: int, dim: int) -> tuple[HNSWIndex, np.ndarray]:
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(dim=dim, config=HNSWConfig(m=16))
    cap = 1 << (n - 1).bit_length()
    idx._cap = cap
    pad = np.zeros((cap - n, dim), np.float32)
    vecs = jnp.asarray(np.concatenate([X, pad]))
    st = K.init_state(cap, dim, jnp.float32, m0=32,
                      lmax=idx.config.lmax, mu=16, ucap=idx._ucap_for(cap))
    idx.state = st._replace(
        vectors=vecs,
        norms=jnp.sum(vecs * vecs, axis=-1),
        levels=jnp.concatenate([jnp.zeros((n,), jnp.int32),
                                jnp.full((cap - n,), -1, jnp.int32)]),
        size=jnp.asarray(n, jnp.int32))
    idx.ids.ext_to_row = {f"v{i}": i for i in range(n)}
    idx.ids.row_to_ext = [f"v{i}" for i in range(n)]
    idx.ids.rebuild_mask()
    return idx, X


def t(label, f, reps=5):
    f()                                  # warm/compile
    f()
    t0 = time.time()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    dt = (time.time() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.2f} ms   ({B/dt:,.0f} q/s)", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    idx, X = fabricate(N, D)
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((B, D)).astype(np.float32)

    from kektordb_tpu.ops import scan as scanlib
    qd = jnp.asarray(Q)
    qn0 = jnp.zeros((B,), jnp.float32)

    def raw_scan():
        d, r = scanlib.scan_search(
            idx.state.vectors, idx.state.norms, idx.state.levels,
            idx.state.deleted, None, qd, qn0, 32,
            metric=dist.L2, mode="approx")
        return jax.device_get((d, r))
    t("raw scan_search k=32 sync", raw_scan)

    t("idx.search k=10", lambda: idx.search(Q, 10))
    t("idx.search k=20 (hybrid fetch)", lambda: idx.search(Q, 20))

    # mask upload cost
    mask = np.zeros(idx._cap, bool)
    mask[::100] = True

    def upload():
        a = jnp.asarray(mask)
        a.block_until_ready()
        return a
    t("1M-bool mask host->device upload", upload)

    t("idx.search k=10 with np mask (upload/call)",
      lambda: idx.search(Q, 10, allow_rows=mask))

    dev_mask = jnp.asarray(mask)

    def search_devmask():
        return idx.search(Q, 10, allow_rows=dev_mask)
    try:
        t("idx.search k=10 with DEVICE mask", search_devmask)
    except Exception as e:
        print("  device mask path failed:", e, flush=True)

    # engine path
    from kektordb_tpu.engine import Engine, EngineConfig
    eng = Engine(EngineConfig(start_background=False)).open()
    eng.create_index("p", m=16)
    eng.indexes["p"].index = idx
    h = eng.indexes["p"]

    words = [f"tok{j}" for j in range(512)]
    nt = 100_000
    t0 = time.time()
    for rr in range(nt):
        h.meta.text.add(rr, "body",
                        f"{words[rr % 512]} {words[(rr*7) % 512]} "
                        f"{words[(rr*13) % 512]}")
    print(f"bm25 ingest {nt}: {time.time()-t0:.1f}s", flush=True)

    metas = [{"grp": i % 100} for i in range(N)]
    t0 = time.time()
    h.meta.set_batch(range(N), metas)
    print(f"meta ingest 1M: {time.time()-t0:.1f}s", flush=True)

    t("bm25 search_arrays (host)",
      lambda: h.meta.text.search_arrays("tok7 tok42"), reps=20)

    t("engine vector-only", lambda: eng.search("p", Q, k=10, decay=False))
    t("engine hybrid (text+vec)",
      lambda: eng.search("p", Q, k=10, text_query="tok7 tok42",
                         alpha=0.5, decay=False))
    t("engine filtered (grp = 7)",
      lambda: eng.search("p", Q, k=10, filter="grp = 7", decay=False))

    from kektordb_tpu.engine import filters as filtlib
    live = idx.ids.live_mask(idx._cap)
    t("filter evaluate_mask 1M (host)",
      lambda: filtlib.evaluate_mask("grp = 7", h.meta, live), reps=5)

    eng.indexes.pop("p")
    eng.close()


if __name__ == "__main__":
    main()
