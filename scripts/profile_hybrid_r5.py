"""Round-5: stage-by-stage timing of the DEVICE-FUSED hybrid path at the
bench's exact config (1M rows, 100k BM25 docs, B=1024) to find where the
~150 ms/window goes (BENCH_r04 hybrid_qps ~6.8k).

Stages: bm25 host scoring | prepare_text | search_device | _fuse_topk |
device_get | _emit_topk | full engine hybrid | hybrid with decay enabled.

Run:  python scripts/profile_hybrid_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_hybrid import fabricate, N, D
from kektordb_tpu.ops import fuse as fuselib

B = 1024


def t(label, f, reps=5):
    f(); f()
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = f()
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    elif isinstance(out, tuple) and hasattr(out[0], "block_until_ready"):
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:48s} {dt*1e3:9.2f} ms   ({B/dt:,.0f} q/s)", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    idx, X = fabricate(N, D)
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((B, D)).astype(np.float32)

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

    t("bm25 search_arrays (host)",
      lambda: h.meta.text.search_arrays("tok7 tok42"), reps=20)

    text_rows, text_vals = h.meta.text.search_arrays("tok7 tok42")
    print("text candidates:", text_rows.size, flush=True)

    cap_t = max(eng.TEXT_CAND_CAP, 40)
    t("prepare_text (host)",
      lambda: fuselib.prepare_text(text_rows, text_vals, cap_t), reps=20)

    def sd():
        d, r, s = idx.search_device(Q, 20)
        jax.block_until_ready((d, r))
        return d, r, s
    t("search_device k=20 (block)", sd)

    d_dev, rows_dev, scale = idx.search_device(Q, 20)
    jax.block_until_ready((d_dev, rows_dev))
    tr, tsn = fuselib.prepare_text(text_rows, text_vals, cap_t)
    tr_d, tsn_d = jnp.asarray(tr), jnp.asarray(tsn)

    def ft():
        sc, rw, dd = fuselib._fuse_topk(
            d_dev, rows_dev.astype(jnp.int32), tr_d, tsn_d,
            jnp.float32(0.5), jnp.float32(scale), 10)
        jax.block_until_ready((sc, rw, dd))
        return sc, rw, dd
    t("_fuse_topk alone (device-resident in)", ft)

    def full_fused():
        return fuselib.fused_topk(d_dev, rows_dev, text_rows, text_vals,
                                  0.5, 10, scale, cap_t)
    t("fused_topk (prep + fuse + device_get)", full_fused)

    sc, rw, dd = full_fused()

    def emit():
        return eng._emit_topk(h, idx, sc, rw, dd, B, 10, False, False)
    t("_emit_topk (host assembly)", emit)

    t("engine vector-only B=1024",
      lambda: eng.search("p", Q, k=10, decay=False))
    t("engine hybrid (device-fused) B=1024",
      lambda: eng.search("p", Q, k=10, text_query="tok7 tok42",
                         alpha=0.5, decay=False))

    # decay-enabled path (host fusion fallback today)
    eng.configure_index("p", memory={"enabled": True,
                                     "decay_half_life": 30 * 24 * 3600.0})
    now = time.time()
    metas = [{"_created_at": now - (i % 1000) * 3600} for i in range(nt)]
    h.meta.set_batch(range(nt), metas)
    t("engine hybrid WITH decay (host path)",
      lambda: eng.search("p", Q, k=10, text_query="tok7 tok42",
                         alpha=0.5, decay=True))
    t("engine vector-only WITH decay (host path)",
      lambda: eng.search("p", Q, k=10, decay=True))

    eng.indexes.pop("p")
    eng.close()


if __name__ == "__main__":
    main()
