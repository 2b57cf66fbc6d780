"""optimize_layout must preserve search results exactly (row relabeling)."""

import numpy as np

from kektordb_tpu.index import HNSWConfig, HNSWIndex
from kektordb_tpu.ops import distance as dist


def test_layout_preserves_results():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(1500, 16)).astype(np.float32)
    idx = HNSWIndex(16, dist.L2, config=HNSWConfig(m=8, chunk=512))
    idx.add_batch([f"v{i}" for i in range(1500)], X)
    Q = rng.normal(size=(32, 16)).astype(np.float32)
    before = idx.search_ids(Q, 5)
    idx.optimize_layout()
    after = idx.search_ids(Q, 5)
    same = sum({h[0] for h in b} == {h[0] for h in a}
               for b, a in zip(before, after))
    assert same >= 30  # row relabeling must not change results materially
    # id lookups still work
    assert idx.get_vector("v7") is not None
    d, i = idx.search(X[7][None], 1)
    assert idx.ids.row_to_ext[int(i[0, 0])] == "v7"
    # streaming add after relayout still works
    idx.add("new", X[0] * 3 + 7)
    assert idx.search_ids((X[0] * 3 + 7)[None], 1)[0][0][0] == "new"


def test_layout_skipped_with_deletes():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 8)).astype(np.float32)
    idx = HNSWIndex(8, dist.L2, config=HNSWConfig(m=8, chunk=128))
    idx.add_batch([f"v{i}" for i in range(300)], X)
    idx.delete("v5")
    idx.optimize_layout()   # no-op, must not corrupt
    assert idx.search_ids(X[6][None], 1)[0][0][0] == "v6"
