"""Device-fused hybrid epilogue (ops/fuse.py) vs the host fusion path.

The engine routes hybrid (vector + BM25) searches through
HNSWIndex.search_device + fuselib.fused_topk — fusion chained onto the
scan's device arrays, one round trip. The host numpy path
(_assemble_fused) implements the same searchWithFusion math
(ops.go:1071-1186); these tests pin the two bit-close on the same data,
including filtered and columnar variants.
"""

import numpy as np
import pytest

from kektordb_tpu.engine import Engine, EngineConfig


def mk():
    return Engine(EngineConfig(start_background=False)).open()


def _build(n=300, d=16, seed=7):
    e = mk()
    e.create_index("t", m=8)
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    metas = [{"body": f"alpha tok{i % 7} beta gamma tok{i % 13}",
              "_indexed_fields": ["body"], "grp": i % 4}
             for i in range(n)]
    e.add_batch("t", [f"v{i}" for i in range(n)], X, metas)
    return e, X, rng


def _force_host(e, name):
    """Shadow search_device on the instance so the engine falls back to
    the host _assemble_fused path."""
    idx = e.indexes[name].index
    idx.search_device = lambda *a, **k: None
    return idx


def _ids_scores(hits):
    return ([h["id"] for h in hits], [h["score"] for h in hits])


class TestDeviceFusedHybridParity:
    def test_matches_host_path(self):
        e, X, rng = _build()
        q = rng.normal(size=(6, 16)).astype(np.float32)
        got = e.search("t", q, k=10, text_query="tok3 alpha", alpha=0.6,
                       decay=False)
        _force_host(e, "t")
        want = e.search("t", q, k=10, text_query="tok3 alpha", alpha=0.6,
                        decay=False)
        for g, w in zip(got, want):
            gi, gs = _ids_scores(g)
            wi, ws = _ids_scores(w)
            # scores must agree; id order may swap only on near-ties
            assert np.allclose(sorted(gs), sorted(ws), atol=1e-4)
            assert set(gi) == set(wi) or \
                np.allclose(sorted(gs), sorted(ws), atol=1e-6)
            assert gi[0] == wi[0]  # top hit is stable

    def test_matches_host_with_filter(self):
        e, X, rng = _build()
        q = rng.normal(size=(4, 16)).astype(np.float32)
        kw = dict(k=8, text_query="tok5 gamma", alpha=0.4,
                  filter="grp = 2", decay=False)
        got = e.search("t", q, **kw)
        _force_host(e, "t")
        want = e.search("t", q, **kw)
        for g, w in zip(got, want):
            assert [h["id"] for h in g] and \
                all(int(h["id"][1:]) % 4 == 2 for h in g)
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=1e-4)

    def test_text_only_rows_have_no_distance(self):
        """A hit sourced only from the BM25 branch carries no distance
        (host parity: _assemble_fused omits it)."""
        e, X, rng = _build(n=64)
        # text query matching docs far from q, alpha tiny → text dominates
        q = rng.normal(size=(1, 16)).astype(np.float32)
        hits = e.search("t", q, k=30, text_query="tok3", alpha=0.01,
                        decay=False)
        assert hits[0]
        # every hit either has a float distance or omits the key entirely
        for h in hits[0]:
            if "distance" in h:
                assert np.isfinite(h["distance"])

    def test_columnar_and_dict_agree_on_device_path(self):
        e, X, rng = _build()
        q = rng.normal(size=(3, 16)).astype(np.float32)
        kw = dict(k=6, text_query="tok1 beta", alpha=0.5, decay=False)
        hits = e.search("t", q, **kw)
        cols = e.search("t", q, columnar=True, **kw)
        assert cols["ids"] == [[h["id"] for h in hh] for hh in hits]
        for b in range(3):
            for j, h in enumerate(hits[b]):
                assert abs(cols["scores"][b][j] - h["score"]) < 1e-5
                cd = cols["distances"][b][j]
                if "distance" in h:
                    assert abs(cd - h["distance"]) < 1e-3
                else:
                    assert cd is None

    def test_columnar_np_wire_shape(self):
        e, X, rng = _build()
        q = rng.normal(size=(4, 16)).astype(np.float32)
        out = e.search("t", q, k=5, text_query="tok2 alpha", alpha=0.5,
                       decay=False, columnar="np")
        if isinstance(out["scores"], np.ndarray):   # rect fast path taken
            assert out["scores"].shape == (4, 5)
            assert out["scores"].dtype == np.float32
            assert len(out["ids"]) == 4 and len(out["ids"][0]) == 5

    def test_decay_path_works(self):
        """memory.enabled + decay=True routes through the device epilogue
        and still returns sane hits."""
        e, X, rng = _build(n=64)
        from kektordb_tpu.engine import fusion
        e.indexes["t"].memory = fusion.MemoryConfig(
            enabled=True, decay_half_life=3600.0)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        hits = e.search("t", q, k=5, text_query="tok3", alpha=0.5)
        assert hits[0]


def _build_decayed(n=200, d=16, seed=11, model="exponential",
                   half_life=3600.0, layers=None):
    """Index where rows carry staggered ages / access counts / pins so the
    decay multiplier actually reorders results."""
    import time as _t
    from kektordb_tpu.engine import fusion
    e = mk()
    e.create_index("t", m=8)
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    now = _t.time()
    metas = []
    for i in range(n):
        m = {"body": f"alpha tok{i % 7} beta tok{i % 13}",
             "_indexed_fields": ["body"],
             "_created_at": now - (i % 37) * 600.0,
             "_access_count": i % 5}
        if i % 11 == 0:
            m["_pinned"] = True
        if i % 13 == 0:
            m["_last_accessed"] = now - (i % 7) * 60.0
        if layers and i % 3 == 0:
            m["_memory_layer"] = "episodic"
        metas.append(m)
    e.add_batch("t", [f"v{i}" for i in range(n)], X, metas)
    e.indexes["t"].memory = fusion.MemoryConfig(
        enabled=True, decay_half_life=half_life, decay_model=model,
        layers=layers or {})
    return e, X, rng


class TestDeviceDecayParity:
    """Decay folded into the device epilogue (ops/fuse.py DecayDevice) vs
    the host _assemble_fused + fusion.decay_factors path — same
    search_utils.go:91-141 semantics, one device round trip."""

    @pytest.mark.parametrize("model", ["exponential", "linear", "step",
                                       "ebbinghaus"])
    def test_hybrid_decay_matches_host(self, model):
        e, X, rng = _build_decayed(model=model)
        q = rng.normal(size=(4, 16)).astype(np.float32)
        kw = dict(k=10, text_query="tok3 alpha", alpha=0.6, decay=True)
        got = e.search("t", q, **kw)
        _force_host(e, "t")
        want = e.search("t", q, **kw)
        for g, w in zip(got, want):
            gs = sorted(_ids_scores(g)[1])
            ws = sorted(_ids_scores(w)[1])
            assert np.allclose(gs, ws, atol=2e-3), (model, gs, ws)
            assert g[0]["id"] == w[0]["id"]

    def test_vector_only_decay_matches_host(self):
        e, X, rng = _build_decayed(half_life=1800.0)
        q = rng.normal(size=(5, 16)).astype(np.float32)
        got = e.search("t", q, k=8, decay=True)
        _force_host(e, "t")
        want = e.search("t", q, k=8, decay=True)
        for g, w in zip(got, want):
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=2e-3)
            assert g[0]["id"] == w[0]["id"]

    def test_layer_overrides_match_host(self):
        from kektordb_tpu.engine import fusion
        layers = {"episodic": fusion.LayerConfig(
            decay_half_life=300.0, decay_model="linear")}
        e, X, rng = _build_decayed(layers=layers)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        got = e.search("t", q, k=10, decay=True)
        _force_host(e, "t")
        want = e.search("t", q, k=10, decay=True)
        for g, w in zip(got, want):
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=2e-3)

    def test_pinned_rows_never_decay(self):
        """A pinned stale row must outrank an equally-near unpinned stale
        row after decay (device path)."""
        import time as _t
        from kektordb_tpu.engine import fusion
        e = mk()
        e.create_index("t", m=8)
        rng = np.random.default_rng(3)
        base = rng.normal(size=(16,)).astype(np.float32)
        old = _t.time() - 10 * 3600.0
        # two near-identical vectors, both ancient; only one pinned
        e.add("t", "pinned", (base + 1e-3).tolist(),
              metadata={"_created_at": old, "_pinned": True})
        e.add("t", "stale", (base + 2e-3).tolist(),
              metadata={"_created_at": old})
        for i in range(20):
            e.add("t", f"far{i}",
                  (rng.normal(size=16) * 8).astype(np.float32).tolist())
        e.indexes["t"].memory = fusion.MemoryConfig(
            enabled=True, decay_half_life=600.0)   # 10h >> 10min half-life
        hits = e.search("t", base, k=4, decay=True)[0]
        ids = [h["id"] for h in hits]
        assert ids[0] == "pinned"
        sc = {h["id"]: h["score"] for h in hits}
        assert "stale" not in sc or sc["pinned"] > sc["stale"] * 100

    def test_decay_mirror_invalidates_on_reinforce(self):
        """Reinforcing a decayed row refreshes _last_accessed → the device
        mirror (version-keyed) must rebuild and restore its rank."""
        import time as _t
        from kektordb_tpu.engine import fusion
        e = mk()
        e.create_index("t", m=8)
        rng = np.random.default_rng(5)
        base = rng.normal(size=(16,)).astype(np.float32)
        old = _t.time() - 10 * 3600.0
        e.add("t", "tired", (base + 1e-3).tolist(),
              metadata={"_created_at": old})
        e.add("t", "fresh", (base + 2e-2).tolist(),
              metadata={"_created_at": _t.time()})
        # far decoys so min-max doesn't pin "fresh" to similarity 0
        for i in range(20):
            e.add("t", f"far{i}",
                  (rng.normal(size=16) * 8).astype(np.float32).tolist())
        e.indexes["t"].memory = fusion.MemoryConfig(
            enabled=True, decay_half_life=600.0)
        first = e.search("t", base, k=2, decay=True)[0]
        assert first[0]["id"] == "fresh"    # decay buried the nearer row
        e.reinforce("t", "tired")           # bumps _last_accessed → now
        second = e.search("t", base, k=2, decay=True)[0]
        assert second[0]["id"] == "tired"   # mirror rebuilt, rank restored

    def test_decay_mirror_updates_incrementally(self, monkeypatch):
        """Reinforce-per-read must refresh the mirror with a row scatter
        (update_decay_device), not an O(cap) rebuild — and the scattered
        mirror must be bit-identical to a from-scratch build at the same
        epoch."""
        import time as _t
        from kektordb_tpu.engine import fusion
        from kektordb_tpu.ops import fuse as fuselib
        e = mk()
        e.create_index("t", m=8)
        rng = np.random.default_rng(6)
        now = _t.time()
        for i in range(48):
            e.add("t", f"v{i}", rng.normal(size=16).astype(
                np.float32).tolist(),
                metadata={"_created_at": now - i * 60.0,
                          "_access_count": i % 3})
        h = e.indexes["t"]
        h.memory = fusion.MemoryConfig(enabled=True,
                                       decay_half_life=3600.0)
        q = rng.normal(size=(1, 16)).astype(np.float32)
        e.search("t", q, k=3, decay=True)           # builds the mirror
        assert h.decay_dev is not None
        assert not h.meta.decay.dirty                # consumed
        builds = []
        real_build = fuselib.build_decay_device
        monkeypatch.setattr(fuselib, "build_decay_device",
                            lambda *a: builds.append(1) or real_build(*a))
        for i in range(4):
            e.reinforce("t", f"v{i}")
        e.search("t", q, k=3, decay=True)            # incremental refresh
        assert builds == []                          # NO full rebuild
        dd = h.decay_dev[2]
        cap = dd.packed.shape[0]
        fresh = fuselib._pack_rows(h.meta.decay, h.memory,
                                   np.arange(cap, dtype=np.int64),
                                   dd.epoch)
        np.testing.assert_array_equal(np.asarray(dd.packed), fresh)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


class TestShardedDeviceFusion:
    """ShardedHNSW.search_device: the engine chains the fused epilogue
    onto the SPMD merge output — multi-chip hybrid/decay serving in one
    dispatch, parity with the host fusion path."""

    def _build(self, n=400, d=16):
        e = mk()
        e.create_index("s", m=8, shards=4)
        rng = np.random.default_rng(9)
        X = rng.normal(size=(n, d)).astype(np.float32)
        metas = [{"body": f"alpha tok{i % 7} beta tok{i % 13}",
                  "_indexed_fields": ["body"], "grp": i % 4}
                 for i in range(n)]
        e.add_batch("s", [f"v{i}" for i in range(n)], X, metas)
        return e, X, rng

    def test_sharded_hybrid_matches_host(self):
        e, X, rng = self._build()
        q = rng.normal(size=(5, 16)).astype(np.float32)
        kw = dict(k=8, text_query="tok3 alpha", alpha=0.6, decay=False)
        assert e.indexes["s"].index.search_device(q, 8) is not None
        got = e.search("s", q, **kw)
        _force_host(e, "s")
        want = e.search("s", q, **kw)
        for g, w in zip(got, want):
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=1e-4)
            assert g[0]["id"] == w[0]["id"]

    def test_sharded_hybrid_filtered(self):
        e, X, rng = self._build()
        q = rng.normal(size=(3, 16)).astype(np.float32)
        kw = dict(k=6, text_query="tok5", alpha=0.4, filter="grp = 2",
                  decay=False)
        got = e.search("s", q, **kw)
        assert got[0] and all(int(h["id"][1:]) % 4 == 2 for h in got[0])
        _force_host(e, "s")
        want = e.search("s", q, **kw)
        for g, w in zip(got, want):
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=1e-4)

    def test_sharded_decay_matches_host(self):
        import time as _t
        from kektordb_tpu.engine import fusion
        e, X, rng = self._build()
        now = _t.time()
        for i in range(0, 400, 3):
            e.update_metadata("s", f"v{i}",
                              {"_created_at": now - (i % 50) * 600.0})
        e.indexes["s"].memory = fusion.MemoryConfig(
            enabled=True, decay_half_life=3600.0)
        q = rng.normal(size=(4, 16)).astype(np.float32)
        got = e.search("s", q, k=8, decay=True)
        _force_host(e, "s")
        want = e.search("s", q, k=8, decay=True)
        for g, w in zip(got, want):
            assert np.allclose(sorted(_ids_scores(g)[1]),
                               sorted(_ids_scores(w)[1]), atol=2e-3)
            assert g[0]["id"] == w[0]["id"]
