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
