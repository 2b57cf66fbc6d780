"""HTTP API contract tests against a live in-process server.

Reference model: pkg/client/e2e_test.go (real server on a port, full
lifecycle) + testdata/api_contracts.json status-code contracts — duplicate
index → 409, duplicate id → 409, missing index → 404, self-link → 400,
index delete → 204, healthz → {"status": "ok"}."""

import asyncio
import threading

import numpy as np
import pytest
import requests

from kektordb_tpu.engine import Engine, EngineConfig
from kektordb_tpu.server import make_app


class ServerFixture:
    def __init__(self):
        self.engine = Engine(EngineConfig(start_background=False)).open()
        self.port = None
        self._loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(15), "server failed to start"
        self.base = f"http://127.0.0.1:{self.port}"

    def _run(self):
        from aiohttp import web
        asyncio.set_event_loop(self._loop)

        async def start():
            from kektordb_tpu.services.embeddings import HashingEmbedder
            from kektordb_tpu.services.gardener import Gardener, \
                GardenerConfig
            gardener = Gardener(self.engine, config=GardenerConfig(),
                                embedder=HashingEmbedder())
            app = make_app(self.engine, gardener=gardener)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = site._server.sockets[0].getsockname()[1]
            self._started.set()

        self._loop.run_until_complete(start())
        self._loop.run_forever()

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)


@pytest.fixture(scope="module")
def srv():
    s = ServerFixture()
    yield s
    s.stop()


def test_healthz(srv):
    r = requests.get(srv.base + "/healthz")
    assert r.status_code == 200
    assert r.json()["status"] == "ok"


def test_index_lifecycle_contracts(srv):
    body = {"index_name": "CT_IDX", "metric": "cosine",
            "precision": "float32", "m": 8, "ef_construction": 50,
            "text_language": "english"}
    assert requests.post(srv.base + "/vector/actions/create",
                         json=body).status_code == 200
    # duplicate MUST 409
    assert requests.post(srv.base + "/vector/actions/create",
                         json=body).status_code == 409
    r = requests.get(srv.base + "/vector/indexes")
    assert r.status_code == 200
    assert any(i["name"] == "CT_IDX" for i in r.json())
    r = requests.get(srv.base + "/vector/indexes/CT_IDX")
    assert r.status_code == 200
    for f in ("name", "metric", "precision", "vector_count"):
        assert f in r.json()

    # vectors
    add = {"index_name": "CT_IDX", "id": "v1",
           "vector": [0.1, 0.2, 0.3, 0.4],
           "metadata": {"content": "test memory", "type": "memory"}}
    assert requests.post(srv.base + "/vector/actions/add",
                         json=add).status_code == 200
    assert requests.post(srv.base + "/vector/actions/add",
                         json=add).status_code == 409   # duplicate id
    batch = {"index_name": "CT_IDX", "vectors": [
        {"id": "v2", "vector": [0.15, 0.25, 0.35, 0.45],
         "metadata": {"content": "batch 1"}},
        {"id": "v3", "vector": [0.2, 0.3, 0.4, 0.5]}]}
    r = requests.post(srv.base + "/vector/actions/add-batch", json=batch)
    assert r.status_code == 200 and r.json()["status"] == "ok"

    r = requests.get(srv.base + "/vector/indexes/CT_IDX/vectors/v1")
    assert r.status_code == 200
    assert set(r.json()) >= {"id", "vector", "metadata"}
    r = requests.post(srv.base + "/vector/actions/get-vectors",
                      json={"index_name": "CT_IDX", "ids": ["v1", "v2"]})
    assert r.status_code == 200 and len(r.json()) == 2

    # search
    r = requests.post(srv.base + "/vector/actions/search",
                      json={"index_name": "CT_IDX",
                            "query_vector": [0.1, 0.2, 0.3, 0.4], "k": 2})
    assert r.status_code == 200
    assert r.json()["ids"][0] == "v1"
    r = requests.post(srv.base + "/vector/actions/search-with-scores",
                      json={"index_name": "CT_IDX",
                            "query_vector": [0.1, 0.2, 0.3, 0.4], "k": 2})
    assert r.status_code == 200 and isinstance(r.json(), list)
    # filter-only search
    r = requests.post(srv.base + "/vector/actions/search",
                      json={"index_name": "CT_IDX",
                            "query_vector": [0.1, 0.2, 0.3, 0.4],
                            "filter": "type = memory", "k": 5})
    assert r.status_code == 200
    assert r.json()["ids"] == ["v1"]

    # delete index → 204, then missing → 404
    assert requests.delete(
        srv.base + "/vector/indexes/CT_IDX").status_code == 204
    assert requests.get(
        srv.base + "/vector/indexes/CT_IDX").status_code == 404


def test_graph_contracts(srv):
    requests.post(srv.base + "/vector/actions/create",
                  json={"index_name": "CT_G", "metric": "euclidean"})
    for i in range(4):
        requests.post(srv.base + "/vector/actions/add",
                      json={"index_name": "CT_G", "id": f"n{i}",
                            "vector": [float(i), 0.0],
                            "metadata": {"tag": "t"}})
    link = {"index_name": "CT_G", "source_id": "n0", "target_id": "n1",
            "relation_type": "knows", "inverse_relation_type": "known_by"}
    assert requests.post(srv.base + "/graph/actions/link",
                         json=link).status_code == 200
    # self-link rejected 400
    bad = dict(link, target_id="n0")
    assert requests.post(srv.base + "/graph/actions/link",
                         json=bad).status_code == 400
    r = requests.post(srv.base + "/graph/actions/get-links",
                      json={"index_name": "CT_G", "source_id": "n0",
                            "relation_type": "knows"})
    assert r.json()["links"] == ["n1"]
    r = requests.post(srv.base + "/graph/actions/get-incoming",
                      json={"index_name": "CT_G", "target_id": "n1"})
    assert [e["source"] for e in r.json()["incoming"]] == ["n0"]
    requests.post(srv.base + "/graph/actions/link",
                  json={"index_name": "CT_G", "source_id": "n1",
                        "target_id": "n2", "relation_type": "knows"})
    r = requests.post(srv.base + "/graph/actions/find-path",
                      json={"index_name": "CT_G", "source_id": "n0",
                            "target_id": "n2"})
    assert r.json()["path"] == ["n0", "n1", "n2"]
    r = requests.post(srv.base + "/graph/actions/extract-subgraph",
                      json={"index_name": "CT_G", "root_id": "n0",
                            "max_depth": 2})
    assert set(r.json()["nodes"]) >= {"n0", "n1", "n2"}
    # node properties
    assert requests.post(srv.base + "/graph/actions/set-node-properties",
                         json={"index_name": "CT_G", "node_id": "n3",
                               "properties": {"role": "hub"}}
                         ).status_code == 200
    r = requests.post(srv.base + "/graph/actions/get-node-properties",
                      json={"index_name": "CT_G", "node_id": "n3"})
    assert r.json()["properties"]["role"] == "hub"
    r = requests.post(srv.base + "/graph/actions/search-nodes",
                      json={"index_name": "CT_G",
                            "property_filter": "role = hub", "limit": 10})
    assert [n["id"] for n in r.json()["nodes"]] == ["n3"]
    # unlink removes both directions
    assert requests.post(srv.base + "/graph/actions/unlink",
                         json=link).status_code == 200
    r = requests.post(srv.base + "/graph/actions/get-links",
                      json={"index_name": "CT_G", "source_id": "n0"})
    assert r.json()["links"] == []


def test_evolve_and_belief(srv):
    requests.post(srv.base + "/vector/actions/create",
                  json={"index_name": "CT_E", "metric": "cosine"})
    requests.post(srv.base + "/vector/actions/add",
                  json={"index_name": "CT_E", "id": "m1",
                        "vector": [1.0, 0.0, 0.0],
                        "metadata": {"content": "x", "keep": "yes"}})
    r = requests.post(srv.base + "/vector/actions/evolve",
                      json={"index_name": "CT_E", "old_id": "m1",
                            "new_vector": [0.9, 0.1, 0.0],
                            "new_content": "x improved",
                            "reason": "update"})
    assert r.status_code == 200
    j = r.json()
    assert j["status"] == "evolved"
    new_id = j["new_id"]
    r = requests.get(srv.base + f"/vector/indexes/CT_E/vectors/{new_id}")
    assert r.json()["metadata"]["keep"] == "yes"     # metadata preserved
    assert r.json()["metadata"]["content"] == "x improved"
    r = requests.post(srv.base + "/vector/actions/belief-assessment",
                      json={"index_name": "CT_E", "id": new_id})
    assert r.status_code == 200
    assert r.json()["state"] in ("crystallized", "contested", "volatile",
                                 "forming")


def test_kv_and_system(srv):
    assert requests.post(srv.base + "/kv/ct_key",
                         data=b"hello").status_code == 200
    r = requests.get(srv.base + "/kv/ct_key")
    assert r.content == b"hello"
    assert requests.delete(srv.base + "/kv/ct_key").status_code == 200
    assert requests.get(srv.base + "/kv/ct_key").status_code == 404
    r = requests.get(srv.base + "/system/stats")
    assert r.status_code == 200 and "indexes" in r.json()
    r = requests.get(srv.base + "/metrics")
    assert "kektordb_http_requests_total" in r.text
    # reinforce + maintenance-style routes
    r = requests.post(srv.base + "/vector/actions/reinforce",
                      json={"index_name": "CT_E", "ids": ["m1"]})
    assert r.status_code == 200 and r.json()["reinforced"] == 1
    r = requests.post(srv.base + "/vector/indexes/CT_E/cognitive/think")
    assert r.status_code == 202
    r = requests.get(srv.base + "/vector/indexes/CT_E/reflections")
    assert r.status_code == 200
    # sessions
    r = requests.post(srv.base + "/sessions", json={"user_id": "u1"})
    sid = r.json()["session_id"]
    assert requests.post(
        srv.base + f"/sessions/{sid}/end").status_code == 200
    assert requests.post(
        srv.base + "/sessions/nope/end").status_code == 404


def test_transfer_and_export(srv):
    requests.post(srv.base + "/vector/actions/create",
                  json={"index_name": "CT_SRC", "metric": "euclidean"})
    vecs = [{"id": f"s{i}", "vector": [float(i), 1.0],
             "metadata": {"grp": "a" if i < 3 else "b"}}
            for i in range(6)]
    requests.post(srv.base + "/vector/actions/add-batch",
                  json={"index_name": "CT_SRC", "vectors": vecs})
    r = requests.post(srv.base + "/transfer/memory",
                      json={"source_index": "CT_SRC",
                            "target_index": "CT_DST", "filter": "grp = a"})
    assert r.status_code == 200 and r.json()["transferred"] == 3
    r = requests.get(srv.base + "/vector/indexes/CT_DST/export?limit=10")
    assert r.status_code == 200
    assert {v["id"] for v in r.json()["vectors"]} == {"s0", "s1", "s2"}


def test_auth_enabled_server():
    eng = Engine(EngineConfig(start_background=False)).open()
    import asyncio as aio
    from aiohttp import web

    loop = aio.new_event_loop()
    started = threading.Event()
    holder = {}

    def run():
        aio.set_event_loop(loop)

        async def start():
            app = make_app(eng, token="root-secret")
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            holder["port"] = site._server.sockets[0].getsockname()[1]
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(15)
    base = f"http://127.0.0.1:{holder['port']}"
    try:
        # no token → 401 (health stays open)
        assert requests.get(base + "/healthz").status_code == 200
        assert requests.get(base + "/system/stats").status_code == 401
        root = {"Authorization": "Bearer root-secret"}
        assert requests.get(base + "/system/stats",
                            headers=root).status_code == 200
        # mint a read-only key, verify RBAC
        r = requests.post(base + "/auth/keys", headers=root,
                          json={"role": "read", "name": "ro"})
        ro = {"Authorization": "Bearer " + r.json()["token"]}
        assert requests.get(base + "/vector/indexes",
                            headers=ro).status_code == 200
        assert requests.post(base + "/vector/actions/create", headers=ro,
                             json={"index_name": "X"}).status_code == 403
        # revoke → 401
        requests.delete(base + "/auth/keys/" + r.json()["id"], headers=root)
        assert requests.get(base + "/vector/indexes",
                            headers=ro).status_code == 401
    finally:
        loop.call_soon_threadsafe(loop.stop)


def test_sharded_index_over_http(srv):
    """create_index(shards=8) through the REST API, add + search + filter
    (VCREATE shards → ShardedHNSW served end-to-end)."""
    r = requests.post(srv.base + "/vector/indexes",
                      json={"index_name": "http_sh", "m": 8, "shards": 8})
    assert r.status_code == 200, r.text
    rng = np.random.default_rng(11)
    X = rng.normal(size=(96, 12)).astype(np.float32)
    r = requests.post(srv.base + "/vector/actions/add-batch", json={
        "index_name": "http_sh",
        "vectors": [{"id": f"v{i}", "vector": X[i].tolist(),
                     "metadata": {"par": i % 2}} for i in range(96)]})
    assert r.status_code == 200, r.text
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_sh", "query_vector": X[13].tolist(), "k": 1})
    assert r.status_code == 200, r.text
    assert r.json()["results"][0]["id"] == "v13"
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_sh", "query_vector": X[13].tolist(), "k": 3,
        "filter": "par = 0"})
    assert r.status_code == 200, r.text
    ids = [h["id"] for h in r.json()["results"]]
    assert ids and all(int(i[1:]) % 2 == 0 for i in ids)
    r = requests.post(srv.base + "/vector/indexes", json={
        "index_name": "http_bad", "shards": 4096})
    assert r.status_code == 400


def test_batched_search_over_http(srv):
    """query_vectors carries [B, D] in one request → per-query hit lists
    (the serving-throughput API behind BENCH http_qps)."""
    r = requests.post(srv.base + "/vector/indexes",
                      json={"index_name": "http_batch", "m": 8})
    assert r.status_code == 200, r.text
    rng = np.random.default_rng(21)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    r = requests.post(srv.base + "/vector/actions/add-batch", json={
        "index_name": "http_batch",
        "vectors": [{"id": f"b{i}", "vector": X[i].tolist(),
                     "metadata": {"par": i % 2}} for i in range(64)]})
    assert r.status_code == 200, r.text
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_batch", "query_vectors": X[:8].tolist(),
        "k": 3})
    assert r.status_code == 200, r.text
    rb = r.json()["results_batch"]
    assert len(rb) == 8
    assert all(rb[i][0]["id"] == f"b{i}" for i in range(8))
    # batched + filter in the same request
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_batch", "query_vectors": X[:4].tolist(),
        "k": 3, "filter": "par = 1"})
    assert r.status_code == 200, r.text
    rb = r.json()["results_batch"]
    assert len(rb) == 4
    assert all(int(h["id"][1:]) % 2 == 1 for hits in rb for h in hits)


def test_columnar_batched_search_over_http(srv):
    """columnar=True returns parallel ids/scores/distances arrays; the
    base64-f32 query body parses to the same results as JSON floats
    (the serving wire fast path behind BENCH http_columnar_qps)."""
    import base64

    rng = np.random.default_rng(22)
    X = rng.normal(size=(32, 8)).astype(np.float32)
    r = requests.post(srv.base + "/vector/indexes",
                      json={"index_name": "http_col", "m": 8})
    assert r.status_code == 200, r.text
    r = requests.post(srv.base + "/vector/actions/add-batch", json={
        "index_name": "http_col",
        "vectors": [{"id": f"c{i}", "vector": X[i].tolist(),
                     "metadata": {"par": i % 2}} for i in range(32)]})
    assert r.status_code == 200, r.text
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_col", "k": 3, "columnar": True,
        "query_vectors_b64":
        base64.b64encode(X[:8].astype("<f4").tobytes()).decode(),
        "query_shape": [8, 8]})
    assert r.status_code == 200, r.text
    o = r.json()
    assert set(o) >= {"ids", "scores", "distances"}
    assert len(o["ids"]) == 8 and len(o["ids"][0]) == 3
    assert all(o["ids"][i][0] == f"c{i}" for i in range(8))
    assert all(len(o["scores"][i]) == len(o["ids"][i]) ==
               len(o["distances"][i]) for i in range(8))
    # binary wire: scores/distances come back as base64 raw f32 matching
    # the list-columnar values; ragged/fused requests fall back to lists
    r2 = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_col", "k": 3, "columnar": True, "wire": "b64",
        "query_vectors": X[:8].tolist()})
    assert r2.status_code == 200, r2.text
    o2 = r2.json()
    assert o2["shape"] == [8, 3] and "ids" not in o2
    flat = base64.b64decode(o2["ids_b64"]).decode().split("\n")
    assert [flat[i * 3:(i + 1) * 3] for i in range(8)] == o["ids"]
    sc = np.frombuffer(base64.b64decode(o2["scores_b64"]),
                       "<f4").reshape(8, 3)
    di = np.frombuffer(base64.b64decode(o2["distances_b64"]),
                       "<f4").reshape(8, 3)
    assert np.allclose(sc, np.asarray(o["scores"]), atol=1e-4)
    assert np.allclose(di, np.asarray(o["distances"]), atol=1e-4)
    r2 = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_col", "k": 3, "columnar": True, "wire": "b64",
        "query_vectors": X[:4].tolist(), "filter": "par = 1",
        "hydrate": True})
    assert r2.status_code == 200, r2.text
    o2 = r2.json()
    assert "scores_b64" not in o2     # metadata → list-columnar fallback
    assert all(int(i[1:]) % 2 == 1 for row in o2["ids"] for i in row)
    assert all(m.get("par") == 1 for row in o2["metadata"] for m in row)
    # columnar survives the fused path (filter + metadata hydration)
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_col", "k": 3, "columnar": True, "hydrate": True,
        "query_vectors": X[:4].tolist(), "filter": "par = 1"})
    assert r.status_code == 200, r.text
    o = r.json()
    assert all(int(i[1:]) % 2 == 1 for row in o["ids"] for i in row)
    assert all(m.get("par") == 1 for row in o["metadata"] for m in row)
    # bad b64 shape → 400
    r = requests.post(srv.base + "/vector/actions/search", json={
        "index_name": "http_col", "k": 3,
        "query_vectors_b64": base64.b64encode(b"\x00" * 16).decode()})
    assert r.status_code == 400


def test_web_ui_pages_served(srv):
    """Dashboard + API explorer pages and the OpenAPI spec they consume
    (reference: internal/server/ui dashboard + embedded swagger)."""
    r = requests.get(srv.base + "/ui")
    assert r.status_code == 200 and "KektorDB-TPU" in r.text
    assert "graphCanvas" in r.text          # force-graph canvas present
    assert "EventSource" in r.text          # SSE wiring present
    assert "requestAnimationFrame" in r.text   # live force simulation
    assert "extract-subgraph" in r.text        # click-to-expand wiring
    assert "sparkline" in r.text               # events/min dashboard
    r = requests.get(srv.base + "/ui/docs")
    assert r.status_code == 200 and "openapi.json" in r.text
    r = requests.get(srv.base + "/openapi.json")
    assert r.status_code == 200
    spec = r.json()
    assert spec["openapi"].startswith("3.")
    assert "/vector/actions/search" in spec["paths"]
    assert len(spec["paths"]) >= 50


def test_text_only_search_over_http(srv):
    """A request with only text_query (no query_vector/query_text) is a
    valid text-only search — the reference's searchWithFusion text-only
    path (ops.go:896). Ranking is pure BM25."""
    requests.post(srv.base + "/vector/indexes",
                  json={"name": "txtonly", "dim": 4})
    items = []
    for i in range(12):
        items.append({
            "id": f"t{i}",
            "vector": list(np.random.default_rng(i).random(4)),
            "metadata": {
                "body": ("espresso roast coffee" if i % 3 == 0
                         else "orbital mechanics handbook"),
                "_indexed_fields": ["body"]}})
    r = requests.post(srv.base + "/vector/actions/add-batch",
                      json={"index_name": "txtonly", "vectors": items})
    assert r.status_code == 200
    r = requests.post(srv.base + "/vector/actions/search",
                      json={"index_name": "txtonly",
                            "text_query": "espresso coffee", "k": 5})
    assert r.status_code == 200, r.text
    res = r.json()["results"]
    assert res, "text-only search returned nothing"
    assert all(int(h["id"][1:]) % 3 == 0 for h in res), res
    # no text match -> empty results, still 200
    r = requests.post(srv.base + "/vector/actions/search",
                      json={"index_name": "txtonly",
                            "text_query": "zebra", "k": 5})
    assert r.status_code == 200 and r.json()["results"] == []


def test_ui_api_contract(srv):
    """Every field the dashboard JS (ui/index.html) dereferences must be
    present in the live responses — the browser-level wiring check this
    environment can run (no browser binary in the image)."""
    requests.post(srv.base + "/vector/indexes",
                  json={"name": "uic", "dim": 4})
    requests.post(srv.base + "/vector/actions/add",
                  json={"index_name": "uic", "id": "a",
                        "vector": [0.1, 0.2, 0.3, 0.4],
                        "metadata": {"content": "hello"}})
    requests.post(srv.base + "/vector/actions/add",
                  json={"index_name": "uic", "id": "b",
                        "vector": [0.4, 0.3, 0.2, 0.1]})
    requests.post(srv.base + "/graph/actions/link",
                  json={"index_name": "uic", "source_id": "a",
                        "relation_type": "rel", "target_id": "b"})
    # overview tab: /system/stats fields
    st = requests.get(srv.base + "/system/stats").json()
    for key in ("indexes", "graph_nodes", "kv_keys"):
        assert key in st, key
    info = st["indexes"]["uic"]
    for key in ("size", "deleted", "metric", "precision", "serve_mode"):
        assert key in info, key
    # search tab: hit fields {id, score, distance, metadata}
    out = requests.post(
        srv.base + "/vector/actions/search",
        json={"index_name": "uic", "query_vector": [0.1, 0.2, 0.3, 0.4],
              "k": 2, "hydrate": True}).json()
    hit = out["results"][0]
    for key in ("id", "score", "distance", "metadata"):
        assert key in hit, key
    # graph tab: extract-subgraph {nodes: [str], edges: [{source, target,
    # relation, weight}]}
    sg = requests.post(
        srv.base + "/graph/actions/extract-subgraph",
        json={"index_name": "uic", "root_id": "a", "max_depth": 2}).json()
    assert "a" in sg["nodes"] and "b" in sg["nodes"]
    edge = sg["edges"][0]
    for key in ("source", "target", "relation", "weight"):
        assert key in edge, key


def test_concurrent_mixed_clients_over_http(srv):
    """Multi-client mixed load through real sockets: batched/columnar/b64
    searches racing adds, deletes, and metadata updates. The server must
    never 5xx and every search response must parse (reference serves
    readers during writes, hnsw_index.go:71; engine-level analog in
    tests/test_concurrency.py)."""
    import base64

    rng = np.random.default_rng(31)
    X = rng.normal(size=(128, 8)).astype(np.float32)
    r = requests.post(srv.base + "/vector/indexes",
                      json={"index_name": "http_mix", "m": 8})
    assert r.status_code == 200, r.text
    r = requests.post(srv.base + "/vector/actions/add-batch", json={
        "index_name": "http_mix",
        "vectors": [{"id": f"m{i}", "vector": X[i].tolist(),
                     "metadata": {"grp": i % 4}} for i in range(128)]})
    assert r.status_code == 200, r.text

    errors: list[str] = []
    counts = {"search": 0, "write": 0}
    lock = threading.Lock()

    def searcher(seed: int) -> None:
        s = requests.Session()
        rr = np.random.default_rng(seed)
        for i in range(12):
            q = X[rr.integers(0, 128, size=4)]
            mode = i % 3
            body = {"index_name": "http_mix", "k": 3}
            if mode == 0:
                body["query_vectors"] = q.tolist()
            else:
                body["query_vectors_b64"] = base64.b64encode(
                    q.astype("<f4").tobytes()).decode()
                body["query_shape"] = [4, 8]
                body["columnar"] = True
                if mode == 2:
                    body["wire"] = "b64"
            if seed % 2:
                body["filter"] = "grp = 1"
            resp = s.post(srv.base + "/vector/actions/search", json=body)
            if resp.status_code != 200:
                errors.append(f"search {resp.status_code}: "
                              f"{resp.text[:120]}")
                continue
            o = resp.json()
            ok = ("results_batch" in o) or ("ids" in o) \
                or ("ids_b64" in o)
            if not ok:
                errors.append(f"unparseable search response: "
                              f"{str(o)[:120]}")
            with lock:
                counts["search"] += 1

    def writer(seed: int) -> None:
        s = requests.Session()
        rr = np.random.default_rng(100 + seed)
        for i in range(12):
            op = i % 3
            if op == 0:
                resp = s.post(
                    srv.base + "/vector/actions/add",
                    json={"index_name": "http_mix",
                          "id": f"mw{seed}-{i}",
                          "vector": rr.normal(size=8).astype(
                              float).tolist(),
                          "metadata": {"grp": int(rr.integers(0, 4))}})
            elif op == 1:
                resp = s.post(
                    srv.base + "/vector/actions/delete_vector",
                    json={"index_name": "http_mix",
                          "id": f"m{int(rr.integers(0, 128))}"})
            else:
                resp = s.post(
                    srv.base + "/graph/actions/set-node-properties",
                    json={"index_name": "http_mix",
                          "node_id": f"m{int(rr.integers(0, 128))}",
                          "properties":
                          {"grp": int(rr.integers(0, 4))}})
            if resp.status_code >= 500:
                errors.append(f"write {resp.status_code}: "
                              f"{resp.text[:120]}")
            elif resp.status_code == 200:
                with lock:
                    counts["write"] += 1

    threads = [threading.Thread(target=searcher, args=(s,))
               for s in range(4)]
    threads += [threading.Thread(target=writer, args=(s,))
                for s in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors[:5]
    assert counts["search"] >= 40 and counts["write"] >= 12, counts


def test_host_index_keeps_auto_proj_via_api(srv):
    """A server-created host index with NO serve_proj_dim field must keep
    the auto projected-mirror default (absent != explicit 0): the engine
    receives None, and the built arena reports _proj_auto."""
    body = {"index_name": "HOSTAUTO", "metric": "euclidean",
            "precision": "float32", "kind": "host"}
    assert requests.post(srv.base + "/vector/actions/create",
                         json=body).status_code == 200
    import numpy as np
    v = np.zeros(64, np.float32); v[0] = 1.0
    assert requests.post(
        srv.base + "/vector/actions/add",
        json={"index_name": "HOSTAUTO", "id": "a",
              "vector": v.tolist()}).status_code == 200
    h = srv.engine.indexes["HOSTAUTO"]
    assert getattr(h.index, "_proj_auto", False) is True
    # explicit 0 still forces full-dim
    assert requests.post(
        srv.base + "/vector/actions/create",
        json={"index_name": "HOSTFULL", "metric": "euclidean",
              "precision": "float32", "kind": "host",
              "serve_proj_dim": 0}).status_code == 200
    assert requests.post(
        srv.base + "/vector/actions/add",
        json={"index_name": "HOSTFULL", "id": "a",
              "vector": v.tolist()}).status_code == 200
    h2 = srv.engine.indexes["HOSTFULL"]
    assert getattr(h2.index, "_proj_auto", True) is False
