"""Serving-throughput wire formats: batched search over HTTP.

One request carries [B, D] queries; three response formats trade
compatibility for speed (measured at B=2048, 131k rows, one host):

  plain JSON results_batch   ~3-4k QPS    per-hit dicts
  columnar lists             ~20k QPS     parallel ids/scores/distances
  wire="b64" binary          ~33k QPS     scores/distances as raw f32

Run: python examples/serving_wire.py
(reference serves one query per request — BENCHMARKS.md:7-15 measures
sequential single-query clients at ~881 QPS; the batched columnar wire
is the rebuild's serving API, DOCUMENTATION.md "Batched search")
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere
import asyncio
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kektordb_tpu.client.client import KektorDBClient  # noqa: E402
from kektordb_tpu.engine import Engine, EngineConfig  # noqa: E402
from kektordb_tpu.server.http import make_app  # noqa: E402


def serve_in_thread(engine):
    loop = asyncio.new_event_loop()
    holder = {}

    async def boot():
        from aiohttp import web
        runner = web.AppRunner(make_app(engine))
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        holder["port"] = site._server.sockets[0].getsockname()[1]
        await asyncio.Event().wait()

    threading.Thread(
        target=lambda: loop.run_until_complete(boot()), daemon=True).start()
    while "port" not in holder:
        time.sleep(0.05)
    return holder["port"]


def main():
    eng = Engine(EngineConfig(start_background=False)).open()
    # serve_mode="scan": staged vectors serve via the fused MXU scan with
    # no graph build — the right mode for a pure serving demo (and it
    # skips the graph-link compile chain, which dominates cold-start)
    eng.create_index("wire", m=8, serve_mode="scan")
    rng = np.random.default_rng(7)
    X = rng.normal(size=(4096, 64)).astype(np.float32)
    eng.add_batch("wire", [f"v{i}" for i in range(4096)], X)

    port = serve_in_thread(eng)
    c = KektorDBClient(f"http://127.0.0.1:{port}")
    Q = X[:512]

    # 1. plain JSON: list of per-hit dicts per query (most compatible)
    hits = c.vsearch_batch("wire", Q[:4], k=3)
    print("plain:", hits[0][0])

    # 2. columnar: parallel ids/scores/distances arrays (~3x fewer bytes)
    col = c.vsearch_batch("wire", Q[:4], k=3, columnar=True)
    print("columnar ids:", col["ids"][0])

    # 3. binary wire: queries AND results as base64 raw f32 — scores come
    #    back as numpy [B, k]; ragged results transparently fall back
    out = c.vsearch_batch("wire", Q, k=10,
                          binary_queries=True, binary_results=True)
    print("b64 scores:", type(out["scores"]).__name__, out["scores"].shape)

    t0 = time.time()
    for _ in range(4):
        c.vsearch_batch("wire", Q, k=10,
                        binary_queries=True, binary_results=True)
    print(f"b64 wire: {4 * len(Q) / (time.time() - t0):.0f} QPS "
          f"(single synchronous client)")
    eng.close()


if __name__ == "__main__":
    main()
