"""Server-side query micro-batching: many concurrent HTTP searches must
coalesce into few device batches with identical results to serial calls."""

import concurrent.futures as cf

import numpy as np
import requests

from test_http import ServerFixture


def test_concurrent_searches_batch_and_agree():
    srv = ServerFixture()
    try:
        base = srv.base
        rng = np.random.default_rng(0)
        X = rng.normal(size=(500, 16)).astype(np.float32)
        requests.post(base + "/vector/actions/create",
                      json={"index_name": "BATCH", "metric": "euclidean"})
        requests.post(base + "/vector/actions/add-batch", json={
            "index_name": "BATCH",
            "vectors": [{"id": f"v{i}", "vector": X[i].tolist()}
                        for i in range(500)]})

        def one(i):
            r = requests.post(base + "/vector/actions/search", json={
                "index_name": "BATCH", "query_vector": X[i].tolist(),
                "k": 1})
            return i, r.json()["ids"][0]

        with cf.ThreadPoolExecutor(max_workers=32) as pool:
            results = list(pool.map(one, range(64)))
        for i, top in results:
            assert top == f"v{i}", f"query {i} got {top}"
    finally:
        srv.stop()


def test_filtered_and_text_searches_coalesce(monkeypatch):
    """Equal-kwarg non-plain searches (same filter / text query) batch into
    few device calls, agree with the direct path, and distinct kwargs never
    cross-contaminate. A generous coalescing window makes the batching
    assertions deterministic on loaded machines (requests that serialize
    past a 3 ms window each land in their own batch)."""
    monkeypatch.setenv("KEKTOR_BATCH_WINDOW_MS", "120")
    srv = ServerFixture()
    try:
        base = srv.base
        rng = np.random.default_rng(1)
        X = rng.normal(size=(300, 16)).astype(np.float32)
        requests.post(base + "/vector/actions/create",
                      json={"index_name": "FB", "metric": "euclidean"})
        requests.post(base + "/vector/actions/add-batch", json={
            "index_name": "FB",
            "vectors": [{"id": f"v{i}", "vector": X[i].tolist(),
                         "metadata": {"par": "even" if i % 2 == 0
                                      else "odd",
                                      "body": "alpha doc" if i < 150
                                      else "beta doc",
                                      "_indexed_fields": ["body"]}}
                        for i in range(300)]})
        before = requests.get(base + "/system/stats").json()["batcher"]

        def one(i):
            filt = "par = even" if i % 2 == 0 else "par = odd"
            r = requests.post(base + "/vector/actions/search", json={
                "index_name": "FB", "query_vector": X[i].tolist(),
                "k": 1, "filter": filt})
            return i, r.json()["ids"][0]

        with cf.ThreadPoolExecutor(max_workers=16) as pool:
            results = list(pool.map(one, range(40)))
        for i, top in results:
            # the filter parity matches the query row's own parity, so the
            # exact row remains eligible and must be top-1
            assert top == f"v{i}", f"filtered query {i} got {top}"

        # text-fusion searches with identical kwargs also coalesce
        def hybrid(i):
            r = requests.post(base + "/vector/actions/search", json={
                "index_name": "FB", "query_vector": X[i].tolist(),
                "k": 3, "text_query": "alpha", "alpha": 0.5})
            return i, r.json()["ids"]

        with cf.ThreadPoolExecutor(max_workers=16) as pool:
            hy = list(pool.map(hybrid, range(0, 150, 10)))
        for i, ids in hy:
            assert ids, f"hybrid query {i} returned nothing"
            assert all(int(x[1:]) < 150 for x in ids[:1]), \
                f"hybrid top hit should be an alpha doc, got {ids}"

        # text-only (zero-vector) requests must NOT coalesce with
        # vector-carrying requests of the same text_query: the engine
        # decides text-only per batch, so mixing would fuse a garbage
        # vector branch into the text-only client's ranking
        def textonly_or_hybrid(i):
            qv = [0.0] * 16 if i % 2 == 0 else X[i].tolist()
            r = requests.post(base + "/vector/actions/search", json={
                "index_name": "FB", "query_vector": qv,
                "k": 5, "text_query": "beta", "alpha": 0.5})
            return i, r.json()["ids"]

        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            mixed = list(pool.map(textonly_or_hybrid, range(160, 176)))
        for i, ids in mixed:
            if i % 2 == 0:   # text-only: every hit must be a beta doc
                assert ids and all(int(x[1:]) >= 150 for x in ids), \
                    f"text-only query contaminated by vector batch: {ids}"

        after = requests.get(base + "/system/stats").json()["batcher"]
        ran = after["queries"] - before["queries"]
        batches = after["batches"] - before["batches"]
        assert ran == 71, f"expected 71 batched queries, saw {ran}"
        # 40 filtered (2 keys) + 15 hybrid (1 key) + 16 mixed (2 keys):
        # coalescing must beat one-batch-per-request by a wide margin
        assert batches <= ran // 2, \
            f"no coalescing: {batches} batches for {ran} queries"
        assert after["max_batch_seen"] >= 4
    finally:
        srv.stop()
