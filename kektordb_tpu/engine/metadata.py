"""Per-index metadata store: exact inverted index, numeric range columns,
BM25 text index, and the direct row→metadata map.

Reference (SURVEY §2.1 "Metadata indexes", core.go:903-955, 1345-1523):
  (1) inverted map[key]map[value]→roaring bitmap   → dict[key][value]→set[int]
  (2) B-tree per numeric key                       → lazily-sorted numpy column
  (3) BM25 postings per text field                 → text.bm25.BM25Index
  (4) direct metadataMap                           → dict[row]→dict

Roaring bitmaps become plain row-id sets host-side and numpy bool masks at
eval time (the device fold-in happens in the HNSW allow mask). The B-tree
becomes a sorted (values, rows) column pair rebuilt lazily — range queries are
two binary searches (np.searchsorted) instead of tree walks.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np

from ..text.bm25 import BM25Index

# fields whose string value is BM25-indexed when listed here
INDEXED_FIELDS_KEY = "_indexed_fields"


def _as_number(v: Any) -> Optional[float]:
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


class NumericColumn:
    """Sorted-column replacement for the reference's per-key B-tree
    (core.go:949,903)."""

    def __init__(self) -> None:
        self.values: dict[int, float] = {}
        self._sorted: Optional[tuple[np.ndarray, np.ndarray]] = None

    def set(self, row: int, v: float) -> None:
        self.values[row] = v
        self._sorted = None

    def remove(self, row: int) -> None:
        if self.values.pop(row, None) is not None:
            self._sorted = None

    def _cache(self) -> tuple[np.ndarray, np.ndarray]:
        if self._sorted is None:
            rows = np.fromiter(self.values.keys(), np.int64,
                               count=len(self.values))
            vals = np.fromiter(self.values.values(), np.float64,
                               count=len(self.values))
            order = np.argsort(vals, kind="stable")
            self._sorted = (vals[order], rows[order])
        return self._sorted

    def range_rows(self, op: str, v: float) -> np.ndarray:
        vals, rows = self._cache()
        if op == "<":
            return rows[: np.searchsorted(vals, v, "left")]
        if op == "<=":
            return rows[: np.searchsorted(vals, v, "right")]
        if op == ">":
            return rows[np.searchsorted(vals, v, "right"):]
        if op == ">=":
            return rows[np.searchsorted(vals, v, "left"):]
        raise ValueError(op)


class PostingSet(set):
    """Row set with a lazily-cached numpy array — the roaring-bitmap analog
    (core.go:944): incremental set mutation, vectorized mask materialization
    at eval time."""

    __slots__ = ("_arr",)

    def __init__(self, *a):
        super().__init__(*a)
        self._arr: Optional[np.ndarray] = None

    def add(self, x):                       # noqa: A003
        super().add(x)
        self._arr = None

    def discard(self, x):
        super().discard(x)
        self._arr = None

    def rows(self) -> np.ndarray:
        if self._arr is None:
            self._arr = np.fromiter(self, np.int64, len(self))
        return self._arr


class MetadataStore:
    def __init__(self, language: str = "english"):
        self.direct: dict[int, dict[str, Any]] = {}
        self.inverted: dict[str, dict[str, PostingSet]] = {}
        self.numeric: dict[str, NumericColumn] = {}
        self.text = BM25Index(language)

    # -- mutation (AddMetadata populates all four, core.go:1345-1523) --------

    def set(self, row: int, meta: dict[str, Any]) -> None:
        self.remove(row)
        self.direct[row] = dict(meta)
        text_fields = meta.get(INDEXED_FIELDS_KEY) or []
        if isinstance(text_fields, str):
            text_fields = [text_fields]
        for k, v in meta.items():
            if k == INDEXED_FIELDS_KEY:
                continue
            sval = v if isinstance(v, str) else _stable_str(v)
            self.inverted.setdefault(k, {}).setdefault(
                sval, PostingSet()).add(row)
            num = _as_number(v)
            if num is not None:
                self.numeric.setdefault(k, NumericColumn()).set(row, num)
            if k in text_fields and isinstance(v, str):
                self.text.add(row, k, v)

    def update(self, row: int, patch: dict[str, Any]) -> None:
        merged = dict(self.direct.get(row, {}))
        merged.update(patch)
        self.set(row, merged)

    def remove(self, row: int) -> None:
        old = self.direct.pop(row, None)
        if old is None:
            return
        for k, v in old.items():
            if k == INDEXED_FIELDS_KEY:
                continue
            sval = v if isinstance(v, str) else _stable_str(v)
            vals = self.inverted.get(k)
            if vals and sval in vals:
                vals[sval].discard(row)
                if not vals[sval]:
                    del vals[sval]
            col = self.numeric.get(k)
            if col:
                col.remove(row)
        self.text.remove(row)

    def get(self, row: int) -> Optional[dict[str, Any]]:
        return self.direct.get(row)

    # -- term evaluation (evaluateBooleanFilter, core.go:1786-1922) ----------

    def eval_term(self, key: str, op: str, value: str,
                  universe: Iterable[int]) -> set[int]:
        if op == "=":
            return set(self.inverted.get(key, {}).get(value, set()))
        if op == "!=":
            # "!= includes missing-field" semantics (core.go:1885-1922):
            # AndNot against the set of all valid ids
            matched = self.inverted.get(key, {}).get(value, set())
            return set(universe) - matched
        num = _as_number(value)
        if num is None:
            return set()
        col = self.numeric.get(key)
        if col is None:
            return set()
        return set(int(r) for r in col.range_rows(op, num))

    def eval_term_mask(self, key: str, op: str, value: str,
                       live: np.ndarray) -> np.ndarray:
        """Vectorized term evaluation → bool mask [cap] (the device-bitset
        analog of the reference's roaring AND/OR, SURVEY §7.1). `live` is
        the mapped-rows bitset; `!=` includes missing-field rows
        (core.go:1885-1922)."""
        cap = live.size
        mask = np.zeros(cap, bool)
        if op in ("=", "!="):
            ps = self.inverted.get(key, {}).get(value)
            if ps is not None and len(ps):
                rows = ps.rows()
                rows = rows[rows < cap]
                mask[rows] = True
            if op == "!=":
                mask = live & ~mask
            return mask
        num = _as_number(value)
        if num is None:
            return mask
        col = self.numeric.get(key)
        if col is None:
            return mask
        rows = col.range_rows(op, num)
        rows = rows[rows < cap]
        mask[rows] = True
        return mask

    def contains_rows(self, key: str, needle: str) -> set[int]:
        """CONTAINS(field,'text') substring hook (core.go:1783)."""
        needle = needle.lower()
        out = set()
        for row, meta in self.direct.items():
            v = meta.get(key)
            if isinstance(v, str) and needle in v.lower():
                out.add(row)
        return out


def _stable_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)
