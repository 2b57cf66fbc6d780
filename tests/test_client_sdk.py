"""Python SDK against a live server (reference: clients/python test suite
driven by a pytest server fixture, SURVEY §4.6)."""

import numpy as np
import pytest

from test_http import ServerFixture

from kektordb_tpu.client import CognitiveSession, KektorDBClient, KektorDBError
from kektordb_tpu.client.cognitive import MultiAgentCoordinator
from kektordb_tpu.client.langchain import KektorVectorStore


@pytest.fixture(scope="module")
def db():
    srv = ServerFixture()
    yield KektorDBClient(srv.base)
    srv.stop()


def test_health_and_stats(db):
    assert db.health()["status"] == "ok"
    assert "indexes" in db.stats()


def test_vector_lifecycle(db):
    db.vcreate("sdk", metric="euclidean", m=8)
    with pytest.raises(KektorDBError) as e:
        db.vcreate("sdk")
    assert e.value.status == 409
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 8)).astype(np.float32)
    db.vadd("sdk", "a0", X[0], {"kind": "k"})
    db.vadd_batch("sdk", [{"id": f"a{i}", "vector": X[i].tolist(),
                           "metadata": {"n": i}} for i in range(1, 30)])
    out = db.vsearch("sdk", X[3], k=1)
    assert out["ids"] == ["a3"]
    assert db.vsearch_with_scores("sdk", X[3], k=1)[0]["id"] == "a3"
    got = db.vget("sdk", "a5")
    np.testing.assert_allclose(got["vector"], X[5], rtol=1e-6)
    assert db.vget_batch("sdk", ["a1", "a2"])[0]["id"] == "a1"
    db.vreinforce("sdk", ["a3"])
    info = db.index_info("sdk")
    assert info["vector_count"] == 30
    rep = info["memory_report"]
    assert rep["rows_used"] == 30 and rep["device_bytes"] > 0
    exp = db.export_vectors("sdk", limit=5)
    assert len(exp["vectors"]) == 5
    db.vdel("sdk", "a9")
    assert db.vsearch("sdk", X[9], k=1)["ids"] != ["a9"]
    rb = db.vsearch_batch("sdk", X[3:6].tolist(), k=2)
    assert len(rb) == 3 and rb[0][0]["id"] == "a3" and rb[2][0]["id"] == "a5"
    rb = db.vsearch_batch("sdk", X[3:5].tolist(), k=3, filter="n > 10")
    assert all(h["id"] != "a3" for hits in rb for h in hits)


def test_text_only_vsearch(db):
    db.vcreate("sdk_txt", metric="euclidean", m=8)
    rng = np.random.default_rng(1)
    db.vadd_batch("sdk_txt", [
        {"id": f"t{i}",
         "vector": rng.normal(size=4).tolist(),
         "metadata": {"body": "solar panel array" if i < 3 else "deep sea",
                      "_indexed_fields": ["body"]}}
        for i in range(6)])
    out = db.vsearch("sdk_txt", text_query="solar array", k=4)
    assert out["ids"] and all(i in ("t0", "t1", "t2") for i in out["ids"])


def test_graph_and_evolve(db):
    db.vcreate("sdkg", metric="euclidean")
    for i in range(3):
        db.vadd("sdkg", f"g{i}", [float(i), 0.0])
    db.vlink("sdkg", "g0", "r", "g1", inverse_relation_type="r_inv")
    assert db.get_links("sdkg", "g0")["links"] == ["g1"]
    assert db.get_incoming("sdkg", "g1")["incoming"][0]["source"] == "g0"
    db.vlink("sdkg", "g1", "r", "g2")
    assert db.find_path("sdkg", "g0", "g2")["path"] == ["g0", "g1", "g2"]
    assert db.traverse("sdkg", "g0", "r.r")["results"][0]["id"] == "g2"
    sub = db.extract_subgraph("sdkg", "g0", max_depth=2)
    assert set(sub["nodes"]) >= {"g0", "g1", "g2"}
    ev = db.vevolve("sdkg", "g0", [0.1, 0.1], new_content="v2",
                    reason="test")
    assert ev["status"] == "evolved"
    bs = db.belief_state("sdkg", "g1")
    assert bs["state"] in ("crystallized", "contested", "volatile",
                           "forming")
    db.vunlink("sdkg", "g1", "r", "g2")
    assert db.get_links("sdkg", "g1", "r")["links"] == []


def test_kv_and_maintenance(db):
    db.kv_set("sdk_key", "value1")
    assert db.kv_get("sdk_key") == b"value1"
    db.kv_delete("sdk_key")
    with pytest.raises(KektorDBError):
        db.kv_get("sdk_key")
    task = db.trigger_maintenance("sdk", "refine")
    st = task.wait(timeout=120)
    assert st["status"] == "completed"
    db.save()


def test_transfer_and_sessions(db):
    out = db.transfer_memory("sdk", "sdk_copy", filter="n >= 25")
    assert out["transferred"] == 5   # n in {25..29}
    sid = db.start_session("user1")
    assert db.end_session(sid)["status"] == "ended"


def test_cognitive_session_and_coordinator(db):
    sess = CognitiveSession(db, index="sdk_mem", user_id="u1")
    mid = sess.remember("the pipeline deploys on fridays")
    hits = sess.recall("when do we deploy", k=3)
    assert any(h["id"] == mid for h in hits)
    ctx = sess.assemble_context("deploy schedule")
    assert "fridays" in ctx
    sess.end()

    coord = MultiAgentCoordinator(db)
    coord.register("upper", lambda s: {**s, "x": s["x"].upper()})
    coord.register("bang", lambda s: {**s, "x": s["x"] + "!"})
    out = coord.run_pipeline(["upper", "bang"], {"x": "hi"})
    assert out["x"] == "HI!"
    par = coord.run_parallel(["upper", "bang"], {"x": "hi"})
    assert par["upper"]["x"] == "HI" and par["bang"]["x"] == "hi!"
    coord.set_shared("state1", "v")
    assert coord.get_shared("state1") == "v"


def test_langchain_store(db):
    store = KektorVectorStore(db, "lc_idx")
    ids = store.add_texts(["jax runs on tpus", "cats chase mice"],
                          metadatas=[{"src": "a"}, {"src": "b"}])
    docs = store.similarity_search("tpu jax", k=1)
    assert docs[0].metadata["src"] == "a"
    pairs = store.similarity_search_with_score("mice", k=1)
    assert pairs[0][0].metadata["src"] == "b"
    store.delete([ids[0]])
    docs = store.similarity_search("tpu jax", k=2)
    assert all(d.metadata["src"] != "a" for d in docs)


def test_sdk_cognitive_and_sharded_surface(db):
    """New SDK methods: sharded create, reflections, summarize-session."""
    import numpy as np
    c = db
    c.vcreate("sdk_sh", m=8, shards=8)
    rng = np.random.default_rng(5)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    c.vadd_batch("sdk_sh", [
        {"id": f"v{i}", "vector": X[i].tolist(),
         "metadata": {"content": f"text {i}", "session_id": "s7"}}
        for i in range(64)])
    hits = c.vsearch("sdk_sh", X[9].tolist(), k=1)
    assert hits["results"][0]["id"] == "v9"
    out = c.summarize_session("sdk_sh", "s7")
    assert out["member_count"] == 64
    assert c.reflections("sdk_sh") == []
    c.drop_index("sdk_sh")
