"""Multi-device sharding on the 8-virtual-device CPU mesh.

This is the rebuild's replacement for the reference's Go concurrency tests
(SURVEY §4.2): correctness of the SPMD sharded search/build path under
jax.sharding, validated without real multi-chip hardware."""

import numpy as np
import pytest

import jax

from kektordb_tpu.index import BruteForceIndex, HNSWConfig, HNSWIndex
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.parallel import ShardedHNSW, make_mesh


@pytest.fixture(scope="module")
def sharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(4000, 24)).astype(np.float32)
    sh = ShardedHNSW(24, dist.L2,
                     config=HNSWConfig(m=8, ef_construction=64,
                                       ef_search=64, chunk=256),
                     mesh=mesh)
    sh.add_batch([f"v{i}" for i in range(4000)], X)
    oracle = BruteForceIndex(24, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(4000)], X)
    return sh, oracle, X


def test_sharded_recall(sharded):
    sh, oracle, X = sharded
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(64, 24)).astype(np.float32)
    hits = sh.search_ids(Q, 10)
    gd, gi = oracle.search(Q, 10)
    total = 0
    for b in range(64):
        want = {f"v{int(r)}" for r in gi[b] if r >= 0}
        got = {h[0] for h in hits[b]}
        total += len(want & got)
    assert total / (64 * 10) >= 0.9


def test_shard_distribution(sharded):
    sh, _, _ = sharded
    sizes = [len(s) for s in sh.shards]
    assert sum(sizes) == 4000
    assert min(sizes) > 0  # every device holds a shard


def test_sharded_delete(sharded):
    sh, oracle, X = sharded
    assert sh.delete("v7")
    hits = sh.search_ids(X[7][None], 1)
    assert hits[0][0][0] != "v7"
    assert not sh.delete("v7")


def test_sharded_streaming_add(sharded):
    sh, _, X = sharded
    v = X[0] * 0.5 + 10.0
    sh.add("fresh1", v)
    hits = sh.search_ids(v[None], 1)
    assert hits[0][0][0] == "fresh1"


class TestEngineSharded:
    """Sharded index served end-to-end through the Engine (VCREATE shards=N),
    incl. filters, metadata, persistence — on the 8-virtual-device CPU mesh."""

    def test_engine_sharded_lifecycle(self, tmp_path):
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(3)
        X = rng.normal(size=(800, 16)).astype(np.float32)
        e = Engine(EngineConfig(data_dir=str(tmp_path),
                                start_background=False)).open()
        e.create_index("sh", m=8, shards=8)
        e.add_batch("sh", [f"v{i}" for i in range(800)], X,
                    metadatas=[{"grp": i % 4} for i in range(800)])
        assert isinstance(e.indexes["sh"].index, ShardedHNSW)

        # plain search hits the right vector
        hit = e.search("sh", X[17], k=1)[0][0]
        assert hit["id"] == "v17"

        # filtered search respects metadata through global-gid allow masks
        hits = e.search("sh", X[20], k=5, filter="grp = 0",
                        include_metadata=True)[0]
        assert hits and all(h["metadata"]["grp"] == 0 for h in hits)
        assert hits[0]["id"] == "v20"   # 20 % 4 == 0

        # delete
        assert e.delete("sh", "v17")
        assert e.search("sh", X[17], k=1)[0][0]["id"] != "v17"

        # streaming add through the engine
        e.add("sh", "fresh", X[0] + 30.0, {"grp": 9})
        assert e.search("sh", X[0] + 30.0, k=1)[0][0]["id"] == "fresh"

        # checkpoint + reload round-trip
        e.save_snapshot()
        e.close()
        e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                                 start_background=False)).open()
        idx2 = e2.indexes["sh"].index
        assert isinstance(idx2, ShardedHNSW) and len(idx2) == 800
        assert e2.search("sh", X[0] + 30.0, k=1)[0][0]["id"] == "fresh"
        h2 = e2.search("sh", X[20], k=5, filter="grp = 0")[0]
        assert h2 and h2[0]["id"] == "v20"
        e2.close()

    def test_engine_sharded_hybrid_text(self):
        """BM25 fusion + filtered hybrid on a sharded index: text rows are
        global gids, so fusion/mask folding must agree with the sharded
        search's gid row space."""
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(7)
        X = rng.normal(size=(200, 16)).astype(np.float32)
        e = Engine(EngineConfig(start_background=False)).open()
        e.create_index("sh", m=8, shards=4)
        e.add_batch("sh", [f"v{i}" for i in range(200)], X,
                    metadatas=[{"body": "alpha doc" if i < 100
                                else "beta doc",
                                "_indexed_fields": ["body"],
                                "par": i % 2} for i in range(200)])
        hits = e.search("sh", X[3], k=3, text_query="alpha", alpha=0.5)[0]
        assert hits[0]["id"] == "v3"
        hits = e.search("sh", X[150], k=3, text_query="beta",
                        alpha=0.5)[0]
        assert hits[0]["id"] == "v150"
        hits = e.search("sh", X[4], k=3, filter="par = 0",
                        text_query="alpha", alpha=0.5)[0]
        assert hits[0]["id"] == "v4"
        assert all(int(h["id"][1:]) % 2 == 0 for h in hits)
        # text-only (zero vector) across shards
        hits = e.search("sh", np.zeros(16, np.float32), k=5,
                        text_query="beta")[0]
        assert hits and all(int(h["id"][1:]) >= 100 for h in hits)
        e.close()

    def test_engine_sharded_aof_replay(self, tmp_path):
        from kektordb_tpu.engine import Engine, EngineConfig
        rng = np.random.default_rng(4)
        X = rng.normal(size=(64, 8)).astype(np.float32)
        e = Engine(EngineConfig(data_dir=str(tmp_path),
                                start_background=False)).open()
        e.create_index("sh", m=4, shards=4)
        e.add_batch("sh", [f"v{i}" for i in range(64)], X)
        e._aof.flush(fsync=True)
        e._aof.close()          # simulate crash: no snapshot
        e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                                 start_background=False)).open()
        idx2 = e2.indexes["sh"].index
        assert isinstance(idx2, ShardedHNSW)
        assert e2.search("sh", X[5], k=1)[0][0]["id"] == "v5"
        e2.close()


def test_sharded_scan_filtered(sharded):
    sh, oracle, X = sharded
    allow = np.zeros(sh._cap, bool)
    gids = [sh.ids.ext_to_row[f"v{i}"] for i in range(0, 4000, 10)
            if f"v{i}" in sh.ids]
    allow[gids] = True
    d, rows = sh.search(X[:8], 5, allow_rows=allow)
    ok = set(gids)
    assert all(int(r) in ok or r < 0 for r in np.asarray(rows).ravel())


def test_mesh_residency(sharded):
    """Round-3 flagship invariants (VERDICT r2 #1): every shard's arrays
    live on their own mesh device; the stacked serving state is cached
    across queries (zero arena-sized restacks per batch) and is assembled
    from the per-device buffers without cross-device copies."""
    sh, _, X = sharded
    for s, dev in zip(sh.shards, sh.mesh.devices.flat):
        assert s.state.vectors.devices() == {dev}
    st0 = sh._get_stacked()
    # stacked leaves are genuinely mesh-sharded, one piece per device
    pieces = {p.device for p in st0.vectors.addressable_shards}
    assert pieces == set(sh.mesh.devices.flat)
    sh.search(X[:4], 3)
    sh.search(X[4:8], 3)
    assert sh._get_stacked() is st0, "query restacked the resident state"
    # filtered queries reuse it too (allow masks derive in-program)
    allow = np.zeros(sh._cap, bool)
    allow[: len(sh.ids)] = True
    sh.search(X[:4], 3, allow_rows=allow)
    assert sh._get_stacked() is st0
    # a write invalidates exactly once
    sh.add("resident-probe", X[0] + 50.0)
    sh.search(X[:4], 3)
    st1 = sh._get_stacked()
    assert st1 is not st0
    sh.search(X[:4], 3)
    assert sh._get_stacked() is st1


def test_spmd_build_matches_sequential():
    """The one-program-per-chunk SPMD build must produce the same serving
    quality as the per-shard loop it replaced."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(1200, 16)).astype(np.float32)
    ids = [f"v{i}" for i in range(1200)]
    cfg = dict(m=8, ef_construction=48, ef_search=48, chunk=128, intra_k=8)
    spmd = ShardedHNSW(16, dist.L2, config=HNSWConfig(**cfg),
                       mesh=make_mesh(4))
    spmd.add_batch(ids, X)
    seq = ShardedHNSW(16, dist.L2, config=HNSWConfig(**cfg),
                      mesh=make_mesh(4))
    from kektordb_tpu.parallel.sharded import _route
    for s, bidx in enumerate([[j for j in range(1200)
                               if _route(ids[j]) % 4 == s]
                              for s in range(4)]):
        block = [ids[j] for j in bidx]
        seq.shards[s].add_batch(block, X[bidx])
        for e in block:
            seq._register(e, s)
    assert [len(s) for s in spmd.shards] == [len(s) for s in seq.shards]
    oracle = BruteForceIndex(16, dist.L2)
    oracle.add_batch(ids, X)
    Q = rng.normal(size=(32, 16)).astype(np.float32)
    _, gi = oracle.search(Q, 10)
    for idx in (spmd, seq):
        hits = idx.search_ids(Q, 10, mode="beam")   # beam exercises graph
        total = sum(len({f"v{int(r)}" for r in gi[b] if r >= 0} &
                        {h[0] for h in hits[b]}) for b in range(32))
        assert total / 320 >= 0.85, total / 320


def test_spmd_build_int8_shared_quantizer():
    rng = np.random.default_rng(12)
    X = rng.normal(size=(600, 16)).astype(np.float32)
    sh = ShardedHNSW(16, dist.COSINE, dist.INT8,
                     config=HNSWConfig(m=8, ef_construction=48, ef_search=48,
                                       chunk=128, intra_k=8),
                     mesh=make_mesh(4))
    sh.add_batch([f"v{i}" for i in range(600)], X)
    scales = {float(s.quantizer.abs_max) for s in sh.shards}
    assert len(scales) == 1, "shards must share ONE quantizer scale"
    hits = sh.search_ids(X[:16], 1)
    assert sum(h[0][0] == f"v{i}" for i, h in enumerate(hits)) >= 14


def test_capacity_scales_linearly_with_devices(sharded):
    """SURVEY §5 'long context' equivalent, measured: each device holds
    only its own ~N/S rows (hash-balanced), so max index size scales
    linearly with chip count. Verified via per-device arena bytes of the
    resident stacked state."""
    sh, _, _ = sharded
    n = len(sh)
    sizes = np.array([len(s) for s in sh.shards])
    assert sizes.sum() == n
    # hash balance: no shard more than 2x the ideal share
    assert sizes.max() <= 2 * (n / sh.n_shards)
    st = sh._get_stacked()
    total = st.vectors.nbytes
    for piece in st.vectors.addressable_shards:
        assert piece.data.nbytes * sh.n_shards == total   # 1/S per device
    # the per-shard resident arrays ARE the per-device pieces (no replica)
    for s, dev in zip(sh.shards, sh.mesh.devices.flat):
        assert s.state.vectors.nbytes == total // sh.n_shards
        assert s.state.vectors.devices() == {dev}
    # the operator-facing accounting agrees: S equal per-chip footprints
    rep = sh.memory_report()
    assert rep["shards"] == sh.n_shards
    assert len(set(rep["per_shard_bytes"])) == 1
    assert rep["device_bytes"] == sum(rep["per_shard_bytes"])
    assert rep["rows_used"] == n and rep["capacity_rows"] >= n


def test_sharded_checkpoint_degrades_on_smaller_host(tmp_path):
    """A checkpoint written with more shards than this host has devices
    must load as a single unsharded index (ADVICE r2 medium), matching
    the AOF-replay downgrade behavior."""
    from kektordb_tpu.persist.index_io import dump_index, load_index
    rng = np.random.default_rng(13)
    X = rng.normal(size=(300, 12)).astype(np.float32)
    sh = ShardedHNSW(12, dist.L2,
                     config=HNSWConfig(m=8, ef_construction=48, ef_search=48,
                                       chunk=128),
                     mesh=make_mesh(4))
    sh.add_batch([f"v{i}" for i in range(300)], X)
    arrays: dict = {}
    st = dump_index(sh, "idx", arrays)
    st["n_shards"] = 99          # pretend it was saved on a 99-chip mesh
    idx2 = load_index(st, arrays, "idx")
    assert isinstance(idx2, HNSWIndex) and len(idx2) == 300
    hits = idx2.search_ids(X[:8], 1)
    assert all(h[0][0] == f"v{i}" for i, h in enumerate(hits))


def test_sharded_filtered_beam_low_selectivity(sharded):
    """Filtered beam across the mesh: per-query seeds sample each shard's
    allowed rows in-program, so a selective filter cannot strand queries."""
    sh, oracle, X = sharded
    sel = [i for i in range(0, 4000, 25) if f"v{i}" in sh.ids]
    allow = np.zeros(sh._cap, bool)
    gids = [sh.ids.ext_to_row[f"v{i}"] for i in sel]
    allow[gids] = True                      # ~4% selectivity
    hits = sh.search_ids(X[:16], 5, allow_rows=allow, mode="beam")
    ok_ext = {f"v{i}" for i in sel}
    assert all(h[0] in ok_ext for hl in hits for h in hl)
    o_allow = np.zeros(oracle._cap, bool)
    o_allow[sel] = True                     # oracle row i == v{i}
    gd, gi = oracle.search(X[:16], 5, allow_rows=o_allow)
    hit = np.mean([
        len({h[0] for h in hits[b]}
            & {f"v{int(x)}" for x in np.asarray(gi)[b] if x >= 0}) / 5
        for b in range(16)])
    assert hit >= 0.8, hit


def test_sharded_beam_mode(sharded):
    sh, oracle, X = sharded
    rng = np.random.default_rng(7)
    Q = rng.normal(size=(32, 24)).astype(np.float32)
    hits = sh.search_ids(Q, 10, mode="beam")
    gd, gi = oracle.search(Q, 10)
    total = sum(len({f"v{int(r)}" for r in gi[b] if r >= 0} &
                    {h[0] for h in hits[b]}) for b in range(32))
    assert total / 320 >= 0.85


def test_sharded_projected_scan():
    """serve_proj_dim under shard_map: per-shard projected scan + local
    exact re-rank; the merge sees exact distances. Anisotropic data (the
    projection's target regime)."""
    rng = np.random.default_rng(11)
    d = 32
    spectrum = np.exp(-np.arange(d) / 5.0)
    X = (rng.normal(size=(4000, d)) * spectrum).astype(np.float32)
    cfg = HNSWConfig(m=8, serve_mode="scan", serve_proj_dim=8,
                     serve_proj_rerank=48)
    idx = ShardedHNSW(d, dist.L2, dist.F32, cfg, mesh=make_mesh(8))
    idx.add_batch([f"v{i}" for i in range(4000)], X)
    assert idx._get_proj() is not None

    # exact self-hits across all shards
    hits = idx.search_ids(X[:64], 1)
    top1 = sum(hits[b][0][0] == f"v{b}" for b in range(64))
    assert top1 == 64, top1

    # recall vs the same index with projection off
    q = X[:128] + 0.001
    d_on, sh_on, r_on = idx._search_raw(q, 10)
    idx.config.serve_proj_dim = 0
    d_off, sh_off, r_off = idx._search_raw(q, 10)
    idx.config.serve_proj_dim = 8
    agree = np.mean([
        len({(int(sh_on[b, j]), int(r_on[b, j])) for j in range(10)
             if r_on[b, j] >= 0}
            & {(int(sh_off[b, j]), int(r_off[b, j])) for j in range(10)})
        for b in range(128)]) / 10.0
    assert agree >= 0.95, agree

    # filtered: allow mask folds into the projected scan per shard
    gids = [idx.ids.ext_to_row[f"v{i}"] for i in range(0, 4000, 5)]
    hits = idx.search_ids(X[:16], 3, allow_rows=np.array(gids))
    for b in range(16):
        for ext, _ in hits[b]:
            assert int(ext[1:]) % 5 == 0, hits[b]

    # streaming add invalidates the projected stack
    fresh = (X[0] * -5.0).astype(np.float32)
    idx.add("fresh", fresh)
    hits = idx.search_ids(fresh, 1)
    assert hits[0][0][0] == "fresh"
