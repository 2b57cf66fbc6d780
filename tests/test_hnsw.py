"""HNSW recall-vs-brute-force parity and mutation semantics.

Reference model: hnsw_index_test.go (recall vs brute force), hnsw_stress_test.go
(mixed add/search/delete), optimizer tests (refine/vacuum)."""

import numpy as np
import pytest

from kektordb_tpu.index import BruteForceIndex, HNSWIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist


def make_data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def recall_at_k(idx: HNSWIndex, oracle: BruteForceIndex, queries, k=10, **kw):
    gd, gi = oracle.search(queries, k)
    d, i = idx.search(queries, k, **kw)
    hits = 0
    total = 0
    for b in range(queries.shape[0]):
        want = set(int(x) for x in gi[b] if x >= 0)
        got = set(int(x) for x in i[b] if x >= 0)
        hits += len(want & got)
        total += len(want)
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def built():
    n, d = 3000, 32
    X = make_data(n, d)
    cfg = HNSWConfig(m=12, ef_construction=100, ef_search=80, chunk=256)
    idx = HNSWIndex(d, dist.L2, config=cfg)
    idx.add_batch([f"v{i}" for i in range(n)], X)
    oracle = BruteForceIndex(d, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    return idx, oracle, X


def test_recall_l2(built):
    idx, oracle, X = built
    q = make_data(100, 32, seed=9)
    r = recall_at_k(idx, oracle, q, k=10)
    assert r >= 0.93, f"recall@10 = {r}"


def test_rows_agree_with_ids(built):
    idx, oracle, X = built
    # row ids are allocation-ordered, so oracle rows == hnsw rows
    q = X[:5] + 1e-3
    d, i = idx.search(q, 1)
    assert [int(x) for x in i[:, 0]] == list(range(5))
    hits = idx.search_ids(q, 1)
    assert [h[0][0] for h in hits] == [f"v{j}" for j in range(5)]


def test_recall_cosine():
    n, d = 2000, 24
    X = make_data(n, d, seed=3)
    cfg = HNSWConfig(m=12, ef_construction=100, ef_search=80, chunk=256)
    idx = HNSWIndex(d, dist.COSINE, config=cfg)
    idx.add_batch([f"v{i}" for i in range(n)], X)
    oracle = BruteForceIndex(d, dist.COSINE)
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    q = make_data(50, d, seed=10)
    r = recall_at_k(idx, oracle, q, k=10)
    assert r >= 0.93, f"cosine recall@10 = {r}"


def test_recall_int8_cosine():
    n, d = 2000, 24
    X = make_data(n, d, seed=4)
    cfg = HNSWConfig(m=12, ef_construction=100, ef_search=80, chunk=256)
    idx = HNSWIndex(d, dist.COSINE, precision=dist.INT8, config=cfg)
    idx.add_batch([f"v{i}" for i in range(n)], X)
    oracle = BruteForceIndex(d, dist.COSINE)  # exact f32 oracle
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    q = make_data(50, d, seed=11)
    r = recall_at_k(idx, oracle, q, k=10)
    assert r >= 0.80, f"int8 recall@10 vs f32 oracle = {r}"


def test_streaming_adds_visible():
    d = 16
    idx = HNSWIndex(d, dist.L2, config=HNSWConfig(m=8, flush_chunk=8))
    X = make_data(100, d, seed=5)
    for i in range(100):
        idx.add(f"v{i}", X[i])
        # every vector must be immediately searchable (write path invariant)
        dd, ii = idx.search(X[i], 1, ef=40)
        assert int(ii[0, 0]) == i
    assert len(idx) == 100


def test_duplicate_id_rejected():
    idx = HNSWIndex(8, dist.L2)
    idx.add("a", np.zeros(8))
    with pytest.raises(KeyError):
        idx.add("a", np.ones(8))


def test_dim_mismatch_rejected():
    idx = HNSWIndex(8, dist.L2)
    with pytest.raises(ValueError):
        idx.add("a", np.zeros(9))


def test_precision_constraints():
    # hnsw_index.go:187-213 — bf16 euclidean-only, int8 cosine-only
    with pytest.raises(ValueError):
        HNSWIndex(8, dist.COSINE, precision=dist.BF16)
    with pytest.raises(ValueError):
        HNSWIndex(8, dist.L2, precision=dist.INT8)


def test_delete_excluded_from_results():
    d = 16
    X = make_data(300, d, seed=6)
    idx = HNSWIndex(d, dist.L2, config=HNSWConfig(m=8, chunk=128))
    idx.add_batch([f"v{i}" for i in range(300)], X)
    q = X[7][None, :]
    dd, ii = idx.search(q, 1)
    assert int(ii[0, 0]) == 7
    assert idx.delete("v7")
    dd, ii = idx.search(q, 1)
    assert int(ii[0, 0]) != 7
    assert not idx.delete("v7")  # second delete is a no-op


def test_vacuum_reclaims_and_preserves_recall():
    d = 16
    n = 600
    X = make_data(n, d, seed=7)
    idx = HNSWIndex(d, dist.L2, config=HNSWConfig(m=8, chunk=128))
    idx.add_batch([f"v{i}" for i in range(n)], X)
    for i in range(0, n, 3):
        idx.delete(f"v{i}")
    purged = idx.vacuum()
    assert purged == n // 3
    assert idx.deleted_count == 0
    # survivors still searchable with good recall
    keep = np.array([i for i in range(n) if i % 3 != 0])
    oracle = BruteForceIndex(d, dist.L2)
    oracle.add_batch([f"k{i}" for i in keep], X[keep])
    q = make_data(50, d, seed=12)
    gd, _ = oracle.search(q, 5)
    d2, i2 = idx.search(q, 5)
    # compare by distance values (row numbering differs after reindex)
    close = np.isclose(np.sort(d2, axis=1)[:, 0], gd[:, 0], rtol=1e-3).mean()
    assert close >= 0.9
    # freed rows are reused by later adds
    before = idx.ids.capacity_used
    idx.add("new0", make_data(1, d, seed=13)[0])
    idx.flush()
    assert idx.ids.capacity_used == before


def test_refine_improves_fast_build():
    n, d = 2000, 24
    X = make_data(n, d, seed=8)
    cfg = HNSWConfig(m=10, ef_construction=100, ef_search=50, chunk=256)
    idx = HNSWIndex(d, dist.L2, config=cfg)
    idx.add_batch([f"v{i}" for i in range(n)], X, fast=True)
    assert idx.needs_refine
    oracle = BruteForceIndex(d, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    q = make_data(50, d, seed=14)
    r_fast = recall_at_k(idx, oracle, q, k=10)
    idx.turbo_refine()
    assert not idx.needs_refine
    r_ref = recall_at_k(idx, oracle, q, k=10)
    assert r_ref >= r_fast - 0.02
    assert r_ref >= 0.9


def test_filtered_search():
    n, d = 1000, 16
    X = make_data(n, d, seed=15)
    idx = HNSWIndex(d, dist.L2, config=HNSWConfig(m=8, chunk=256))
    idx.add_batch([f"v{i}" for i in range(n)], X)
    allow = np.zeros(n, bool)
    allow[::10] = True  # 10% selectivity
    q = make_data(30, d, seed=16)
    d1, i1 = idx.search(q, 5, allow_rows=allow)
    i1 = np.asarray(i1)
    assert ((i1 % 10 == 0) | (i1 == -1)).all()
    # compare against oracle restricted to the allowed set
    oracle = BruteForceIndex(d, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    gd, gi = oracle.search(q, 5, allow_rows=allow)
    hits = sum(len(set(map(int, gi[b])) & set(map(int, i1[b]))) for b in range(30))
    assert hits / (30 * 5) >= 0.85


def test_full_arena_padded_flush_preserves_last_row():
    """Regression: mode="drop" scatters used a -1 sentinel, which JAX
    normalizes to the LAST row before the bounds check — with the arena
    exactly full (used == cap), any padded flush clobbered row cap-1."""
    d = 16
    cfg = HNSWConfig(m=4, ef_construction=32, ef_search=32, chunk=64,
                     flush_chunk=64)
    idx = HNSWIndex(d, dist.L2, config=cfg)
    cap = idx._cap                       # MIN_CAP
    X = make_data(cap, d, seed=77)
    idx.add_batch([f"v{i}" for i in range(cap)], X)
    assert idx.ids.capacity_used == cap  # arena exactly full
    last_vec_before = np.asarray(idx.state.vectors[cap - 1]).copy()
    last_lvl_before = int(idx.state.levels[cap - 1])
    # a padded refine step (rows padded with -1) over a partial batch
    idx.refine_step(np.arange(10, dtype=np.int32))
    assert int(idx.state.levels[cap - 1]) == last_lvl_before
    np.testing.assert_array_equal(
        np.asarray(idx.state.vectors[cap - 1]), last_vec_before)
    # the last row must still be findable
    dd, ii = idx.search(X[cap - 1][None], k=1)
    assert int(ii[0, 0]) == cap - 1


def test_filtered_beam_low_selectivity_per_query_seeds():
    """mode=beam + selective filter: per-query seed sampling (replacing the
    shared argmax(allow) entry) must keep recall high even when the allowed
    set is a distant cluster (reference smart entry is per-query,
    hnsw_index.go:421-431)."""
    rng = np.random.default_rng(3)
    cents = rng.normal(size=(40, 24)).astype(np.float32) * 8
    X = (cents[np.arange(6000) % 40]
         + rng.normal(size=(6000, 24))).astype(np.float32)
    idx = HNSWIndex(24, dist.L2,
                    config=HNSWConfig(m=8, ef_construction=64, ef_search=64,
                                      chunk=512, serve_mode="beam"))
    idx.add_batch([f"v{i}" for i in range(6000)], X)
    oracle = BruteForceIndex(24, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(6000)], X)
    allow = np.zeros(idx._cap, bool)
    allow[:6000] = (np.arange(6000) % 40) == 7       # 2.5% selectivity
    Q = (cents[7] + rng.normal(size=(32, 24))).astype(np.float32)
    gd, gi = oracle.search(Q, 10, allow_rows=allow)
    d, r = idx.search(Q, 10, allow_rows=allow, mode="beam")
    rec = np.mean([len(set(map(int, r[b])) & set(map(int, gi[b]))) / 10
                   for b in range(32)])
    assert rec >= 0.9, rec
    flat = np.asarray(r)
    assert allow[flat[flat >= 0]].all(), "disallowed row returned"
    for b in range(32):
        rb = [int(x) for x in flat[b] if x >= 0]
        assert len(rb) == len(set(rb)), "duplicate results"


def test_streaming_backpressure_bounds_backlog():
    """serve_mode=auto: sustained add() keeps the unlinked backlog bounded
    by max_unlinked + one chunk (VERDICT r2 weak #5)."""
    cfg = HNSWConfig(m=4, ef_construction=32, ef_search=32, chunk=64,
                     flush_chunk=16, max_unlinked=128, serve_mode="auto")
    idx = HNSWIndex(8, dist.L2, config=cfg)
    X = make_data(2000, 8, seed=9)
    peak = 0
    for i in range(2000):
        idx.add(f"v{i}", X[i])
        peak = max(peak, len(idx._unlinked))
    assert peak <= cfg.max_unlinked + cfg.flush_chunk + cfg.chunk, peak
    # everything is still searchable and linkable
    idx.flush()
    assert not idx._unlinked
    d, r = idx.search(X[:8], 1, mode="beam")
    assert (np.asarray(r)[:, 0] == np.arange(8)).mean() >= 0.8


def test_nav_table_beam_serving():
    """serve_nav_width: the beam navigates from a contiguous [cap, W] copy
    of the first W neighbor slots. Recall must stay close to the full-width
    beam, the cache must track state version (rebuilt after writes), and
    builds must keep using the full table (graph quality unchanged)."""
    n, d = 4000, 24
    X = make_data(n, d, seed=5)
    cfg = HNSWConfig(m=12, ef_construction=100, ef_search=100, chunk=512,
                     serve_mode="beam", serve_nav_width=16)
    idx = HNSWIndex(d, dist.L2, config=cfg)
    idx.add_batch([f"v{i}" for i in range(n)], X)
    oracle = BruteForceIndex(d, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(n)], X)
    q = make_data(64, d, seed=6)

    nav = idx._nav_table()
    assert nav is not None and nav.shape == (idx._cap, 16)
    rec_nav = recall_at_k(idx, oracle, q)
    idx.config.serve_nav_width = 0          # full-width comparison
    rec_full = recall_at_k(idx, oracle, q)
    assert rec_nav >= rec_full - 0.06, (rec_nav, rec_full)
    assert rec_nav >= 0.85, rec_nav

    # cache invalidation: new rows must appear in the nav table's world
    idx.config.serve_nav_width = 16
    v0 = idx._nav_version
    idx.add("extra", X[0] + 0.001)
    idx.flush()
    _ = idx.search(q[:8], 10)
    assert idx._nav_version != v0
    d1, r1 = idx.search(X[:1] + 0.001, 1)
    assert idx.ids.row_to_ext[int(np.asarray(r1)[0, 0])] in ("extra", "v0")
