"""HostArenaIndex: chunk-streamed device scan over a host-RAM arena.

The capacity axis the HBM-resident indexes don't cover (single chip,
N bounded by host RAM — reference analog: mmap arena + linear scan,
pkg/storage/mmap/arena.go). Chunk size is shrunk here so a few thousand
rows exercise the multi-chunk sweep, padding, and merge paths.
"""

import numpy as np
import pytest

from kektordb_tpu.index import BruteForceIndex, HostArenaIndex
from kektordb_tpu.index.hostarena import CHUNK_ROWS
from kektordb_tpu.ops import distance as dist

CHUNK = 2048  # N=5000 grows geometrically to cap 8192 = 4 chunks


def mk(n=5000, d=24, metric=dist.L2, precision=dist.F32, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    idx = HostArenaIndex(d, metric, precision, chunk_rows=CHUNK)
    idx.add_batch([f"v{i}" for i in range(n)], X)
    return idx, X


class TestHostArena:
    def test_matches_bruteforce_exact(self):
        idx, X = mk()
        oracle = BruteForceIndex(24)
        oracle.add_batch([f"v{i}" for i in range(len(X))], X)
        q = X[:64] + 0.01
        d, r = idx.search(q, 10)
        od, orr = oracle.search(q, 10)
        # same rows (both allocate rows in insertion order)
        assert (r == orr).mean() > 0.999
        np.testing.assert_allclose(d, od, rtol=1e-4, atol=1e-3)
        rep = idx.memory_report()
        assert rep["host_bytes"] >= idx._vectors.nbytes
        assert rep["device_bytes"] < rep["host_bytes"]  # chunk-resident only
        assert rep["rows_used"] == len(X)

    def test_multi_chunk_coverage(self):
        """Top hit in every chunk of the arena is found."""
        idx, X = mk()
        assert idx._cap > CHUNK  # really multi-chunk
        for probe in (5, CHUNK + 7, len(X) - 3):
            d, r = idx.search(X[probe], 1)
            assert r[0, 0] == probe
            assert d[0, 0] < 1e-3

    def test_cosine(self):
        idx, X = mk(metric=dist.COSINE)
        d, r = idx.search(X[100], 3)
        assert r[0, 0] == 100 and d[0, 0] < 1e-3

    def test_int8(self):
        idx, X = mk(precision=dist.INT8)
        d, r = idx.search(X[:32], 5)
        hit1 = (r[:, 0] == np.arange(32)).mean()
        assert hit1 > 0.9, hit1   # int8 quantization: near-exact top-1

    def test_filtered(self):
        idx, X = mk()
        allow = np.zeros(idx._cap, bool)
        allow[::7] = True
        d, r = idx.search(X[:50], 5, allow_rows=allow)
        live = r[r >= 0]
        assert live.size and np.all(live % 7 == 0)

    def test_delete_and_reuse(self):
        idx, X = mk(n=1000)
        assert idx.delete("v3")
        d, r = idx.search(X[3], 1)
        assert r[0, 0] != 3
        idx.add("back", X[3])   # freed row reused
        d, r = idx.search(X[3], 1)
        assert idx.ids.row_to_ext[r[0, 0]] == "back"

    def test_odd_batch_padding(self):
        idx, X = mk(n=2000)
        d, r = idx.search(X[:7], 3)    # B=7 → padded to 32, sliced back
        assert d.shape == (7, 3) and (r[:, 0] == np.arange(7)).all()

    def test_empty_and_errors(self):
        idx = HostArenaIndex(8, chunk_rows=1024)
        d, r = idx.search(np.zeros(8, np.float32), 5)
        assert (r == -1).all() and np.isinf(d).all()
        with pytest.raises(ValueError):
            HostArenaIndex(8, chunk_rows=1000)
        with pytest.raises(ValueError):
            HostArenaIndex(8, metric="nope")
        idx.add("a", np.ones(8, np.float32))
        with pytest.raises(ValueError):
            idx.add("b", np.ones(9, np.float32))

    def test_search_ids(self):
        idx, X = mk(n=500)
        hits = idx.search_ids(X[42], 3)
        assert hits[0][0][0] == "v42"

    def test_default_chunk_is_aligned(self):
        assert CHUNK_ROWS % 1024 == 0

    def test_allow_rows_negative_sentinel_ignored(self):
        """-1 (missing-id sentinel) must not wrap to the arena tail."""
        idx, X = mk(n=1000)
        d, r = idx.search(X[:4], 2, allow_rows=np.array([3, -1]))
        live = r[r >= 0]
        assert live.size and np.all(live == 3)

    def test_int8_l2_distances_in_real_domain(self):
        """int8 L2 rescales out of the quantized domain like kind=hnsw."""
        idx, X = mk(n=2000, precision=dist.INT8)
        oracle = BruteForceIndex(24)   # f32 exact
        oracle.add_batch([f"v{i}" for i in range(2000)], X)
        d, _ = idx.search(X[:16] + 0.5, 1)
        od, _ = oracle.search(X[:16] + 0.5, 1)
        # same magnitude as real distances (quantized domain would be
        # off by (127/abs_max)^2 ~ 1000x); int8 noise stays small once
        # true distances are O(1)
        ratio = d[:, 0] / np.maximum(od[:, 0], 1e-9)
        assert np.all(ratio < 2.0) and np.all(ratio > 0.5), ratio

    def test_geometric_growth(self):
        idx = HostArenaIndex(8, chunk_rows=1024)
        idx.add("a", np.ones(8, np.float32))
        assert idx._cap == 1024        # not the default 262144
        idx.add_batch([f"b{i}" for i in range(1500)],
                      np.ones((1500, 8), np.float32))
        assert idx._cap == 2048 and idx._cap % 1024 == 0

    def test_bf16_checkpoint_roundtrip(self, tmp_path):
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(5)
        X = rng.normal(size=(100, 16)).astype(np.float32)
        e = Engine(EngineConfig(data_dir=str(tmp_path),
                                start_background=False)).open()
        e.create_index("b16", kind="host", precision="bfloat16")
        e.add_batch("b16", [f"v{i}" for i in range(100)], X)
        e.save_snapshot()
        e.close()
        e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                                 start_background=False)).open()
        assert e2.search("b16", X[7], k=1)[0][0]["id"] == "v7"
        e2.close()


class TestEngineHost:
    def test_engine_kind_host_lifecycle(self, tmp_path):
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(2)
        X = rng.normal(size=(300, 16)).astype(np.float32)
        e = Engine(EngineConfig(data_dir=str(tmp_path),
                                start_background=False)).open()
        e.create_index("h", kind="host")
        e.add_batch("h", [f"v{i}" for i in range(300)], X,
                    metadatas=[{"grp": i % 3} for i in range(300)])
        assert isinstance(e.indexes["h"].index, HostArenaIndex)
        assert e.search("h", X[9], k=1)[0][0]["id"] == "v9"
        hits = e.search("h", X[9], k=5, filter="grp = 0",
                        include_metadata=True)[0]
        assert hits and all(h["metadata"]["grp"] == 0 for h in hits)
        assert e.delete("h", "v9")
        assert e.search("h", X[9], k=1)[0][0]["id"] != "v9"
        # checkpoint round-trip preserves the host arena
        e.save_snapshot()
        e.close()
        e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                                 start_background=False)).open()
        idx2 = e2.indexes["h"].index
        assert isinstance(idx2, HostArenaIndex) and len(idx2) == 299
        assert e2.search("h", X[10], k=1)[0][0]["id"] == "v10"
        e2.close()

    def test_bad_kind_rejected(self):
        from kektordb_tpu.engine import Engine, EngineConfig
        e = Engine(EngineConfig(start_background=False)).open()
        with pytest.raises(ValueError):
            e.create_index("x", kind="mmap")


class TestHostArenaProjected:
    """proj_dim: streamed [cap, p] bf16 sweep + exact host re-rank —
    the H2D-bound host arena's projection analog (D*bytes/2p less
    transfer). Anisotropic data, the projection's target regime."""

    def _mk(self, n=5000, d=48, p=12, **kw):
        rng = np.random.default_rng(3)
        spectrum = np.exp(-np.arange(d) / 6.0)
        basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
        X = ((rng.normal(size=(n, d)) * spectrum) @ basis.T
             ).astype(np.float32)
        idx = HostArenaIndex(d, chunk_rows=2048, proj_dim=p,
                             proj_rerank=48, **kw)
        idx.add_batch([f"v{i}" for i in range(n)], X)
        return idx, X

    def test_recall_vs_exact(self):
        idx, X = self._mk()
        oracle = BruteForceIndex(48)
        oracle.add_batch([f"v{i}" for i in range(len(X))], X)
        q = X[:64] + 0.001
        d, r = idx.search(q, 10)
        od, orr = oracle.search(q, 10)
        hit = np.mean([len(set(r[b][r[b] >= 0]) & set(orr[b]))
                       for b in range(64)]) / 10.0
        assert hit >= 0.95, hit
        # distances are exact f32 (host re-rank)
        m = r[:, 0] == orr[:, 0]
        np.testing.assert_allclose(d[m, 0], od[m, 0], rtol=1e-4,
                                   atol=1e-3)

    def test_streaming_add_projected(self):
        idx, X = self._mk(n=3000)
        fresh = (X[0] * -4.0).astype(np.float32)
        idx.add("fresh", fresh)
        d, r = idx.search(fresh, 1)
        assert idx.ids.row_to_ext[int(r[0, 0])] == "fresh"

    def test_filtered_projected(self):
        idx, X = self._mk(n=3000)
        allow = np.zeros(idx._cap, bool)
        allow[::4] = True
        d, r = idx.search(X[:20], 5, allow_rows=allow)
        live = r[r >= 0]
        assert live.size and np.all(live % 4 == 0)

    def test_checkpoint_preserves_proj_config(self, tmp_path):
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(4)
        spectrum = np.exp(-np.arange(24) / 4.0)
        X = (rng.normal(size=(400, 24)) * spectrum).astype(np.float32)
        e = Engine(EngineConfig(data_dir=str(tmp_path),
                                start_background=False)).open()
        e.create_index("hp", kind="host", serve_proj_dim=6,
                       serve_proj_rerank=32)
        e.add_batch("hp", [f"v{i}" for i in range(400)], X)
        assert e.search("hp", X[5], k=1)[0][0]["id"] == "v5"
        e.save_snapshot(); e.close()
        e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                                 start_background=False)).open()
        idx2 = e2.indexes["hp"].index
        assert idx2.proj_dim == 6
        assert e2.search("hp", X[6], k=1)[0][0]["id"] == "v6"
        e2.close()

    def test_proj_dim_larger_than_dim_degrades(self):
        """proj_dim >= dim is not applicable — searches must fall back to
        the full sweep, never crash (regression: the fit path assigned a
        [n, D] projection into a [n, p] mirror)."""
        rng = np.random.default_rng(6)
        X = rng.normal(size=(300, 16)).astype(np.float32)
        idx = HostArenaIndex(16, chunk_rows=1024, proj_dim=64)
        idx.add_batch([f"v{i}" for i in range(300)], X)
        d, r = idx.search(X[3], 1)
        assert idx.ids.row_to_ext[int(r[0, 0])] == "v3"
        assert idx._proj_basis is None


class TestAutoProjection:
    """proj_dim="auto" (the default): the projected mirror enables itself
    once the arena outgrows one streamed chunk (VERDICT r4 #6)."""

    def test_auto_enables_past_one_chunk(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(2200, 64)).astype(np.float32)
        idx = HostArenaIndex(64, chunk_rows=1024)
        idx.add_batch([f"v{i}" for i in range(1200)], X[:1200])
        assert idx._proj_auto and idx.proj_dim == 0
        idx.search(X[:4], 5)
        assert idx.proj_dim == 32 and idx._proj_basis is not None
        # results still come from the exact full-dim re-rank
        d, r = idx.search(X[:4], 1)
        assert list(r[:, 0]) == [0, 1, 2, 3]

    def test_auto_stays_off_small(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(500, 64)).astype(np.float32)
        idx = HostArenaIndex(64, chunk_rows=1024)
        idx.add_batch([f"v{i}" for i in range(500)], X)
        idx.search(X[:2], 3)
        assert idx.proj_dim == 0 and idx._proj_basis is None

    def test_auto_stays_off_small_dim(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(2048, 32)).astype(np.float32)
        idx = HostArenaIndex(32, chunk_rows=1024)
        idx.add_batch([f"v{i}" for i in range(2048)], X)
        idx.search(X[:2], 3)
        assert idx.proj_dim == 0

    def test_explicit_zero_forces_fulldim(self):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(2048, 64)).astype(np.float32)
        idx = HostArenaIndex(64, chunk_rows=1024, proj_dim=0)
        idx.add_batch([f"v{i}" for i in range(2048)], X)
        idx.search(X[:2], 3)
        assert idx.proj_dim == 0 and idx._proj_basis is None

    def test_auto_survives_checkpoint(self, tmp_path):
        from kektordb_tpu.persist import index_io
        rng = np.random.default_rng(4)
        X = rng.normal(size=(1500, 64)).astype(np.float32)
        idx = HostArenaIndex(64, chunk_rows=1024)
        idx.add_batch([f"v{i}" for i in range(1500)], X)
        arrays = {}
        st = index_io.dump_index(idx, "h", arrays)
        idx2 = index_io.load_index(st, arrays, "h")
        assert idx2._proj_auto
        idx2.chunk_rows = 1024        # tuning knob isn't persisted
        idx2.search(X[:2], 3)
        assert idx2.proj_dim == 32

    def test_concurrent_first_fit_publishes_atomically(self):
        """Auto-proj's first fit runs on the SEARCH path, which the engine
        serves under the shared RW lock: concurrent searches must never
        observe a partial mirror (basis set, vecs missing/zeros) — every
        thread gets correct top-1 and no exceptions."""
        import threading as _t
        rng = np.random.default_rng(5)
        n, d = 4096, 64
        X = rng.normal(size=(n, d)).astype(np.float32)
        idx = HostArenaIndex(64, chunk_rows=1024)
        idx.add_batch([f"v{i}" for i in range(n)], X)
        assert idx._proj_basis is None          # fit not triggered yet
        Q = X[:8] + 0.001 * rng.normal(size=(8, d)).astype(np.float32)
        errs, bad = [], []
        start = _t.Barrier(6)

        def worker():
            try:
                start.wait()
                for _ in range(3):
                    _, rows = idx.search(Q, 3)
                    if not (rows[:, 0] == np.arange(8)).all():
                        bad.append(rows[:, 0].tolist())
            except Exception as exc:            # noqa: BLE001
                errs.append(repr(exc))

        ts = [_t.Thread(target=worker) for _ in range(6)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs, errs
        assert not bad, bad[:3]
        assert idx.proj_dim == 32 and idx._proj_basis is not None
