"""IDMap ext-id mirror: vectorized lookup must track every mutation path.

Reference parity: hnsw_index.go:74-75 keeps ext<->int maps host-side; the
mirror is the rebuild's vectorized serving-path view of that map.
"""
import numpy as np

from kektordb_tpu.index.base import IDMap


def test_exts_array_tracks_incremental_mutations():
    m = IDMap()
    rows = [m.alloc(f"a{i}") for i in range(10)]
    arr = m.exts_array()
    assert arr[rows[3]] == "a3"
    # release -> None; realloc reuses the slot
    r = m.release("a3")
    assert m.exts_array()[r] is None
    r2 = m.alloc("b3")
    assert r2 == r and m.exts_array()[r] == "b3"
    m.unmap("a4")
    assert m.exts_array()[rows[4]] is None
    # growth beyond the initial mirror keeps entries in place (no rebuild
    # thrash): fill past 1024
    for i in range(2000):
        m.alloc(f"c{i}")
    arr = m.exts_array()
    assert arr[m.get("c1999")] == "c1999"
    assert arr[rows[0]] == "a0"


def test_exts_array_invalidated_on_wholesale_replacement():
    m = IDMap()
    for i in range(8):
        m.alloc(f"x{i}")
    _ = m.exts_array()
    # checkpoint-load style: assign new maps directly + rebuild_mask
    m.ext_to_row = {f"y{i}": i for i in range(4)}
    m.row_to_ext = [f"y{i}" for i in range(4)]
    m.rebuild_mask()
    arr = m.exts_array()
    assert arr[2] == "y2" and arr[3] == "y3"
    # optimize_layout style: replace the list WITHOUT rebuild_mask — the
    # retained-reference identity check must still catch it
    m.row_to_ext = ["z0", "z1", "z2", "z3"]
    for i in range(4):
        m.ext_to_row[f"z{i}"] = i
    arr = m.exts_array()
    assert arr[0] == "z0" and arr[3] == "z3"


def test_exts_array_matches_exts_of():
    m = IDMap()
    for i in range(50):
        m.alloc(f"v{i}")
    for i in range(0, 50, 3):
        m.release(f"v{i}")
    rows = np.arange(50)
    arr = m.exts_array()
    assert list(arr[rows]) == m.exts_of(list(rows))
