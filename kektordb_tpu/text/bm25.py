"""BM25 inverted text index.

Reference: pkg/core's per-index text machinery — posting lists
map[field]map[token]{DocID,TF} + TextIndexStats{TotalDocs, AvgFieldLength,
DocLengths} (core.go:908-951), scoring k1=1.2 b=0.75 (core.go:1958-1961),
IDF log(1+(N-df+0.5)/(df+0.5)) (core.go:2044-2068).

Postings are kept host-side as dicts (the mutable source of truth —
mutation-heavy), while scoring runs on a derived CSR snapshot per field
(token → segment of parallel row/tf arrays + a dense doc-length column),
rebuilt lazily after writes. Each query term scores its whole posting
segment as one numpy expression and segments aggregate via bincount —
no per-posting Python loops on the query path (SURVEY §7.1 vectorized
filter/score rule; the former dict-walk scorer was the hybrid-QPS
bottleneck).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from .analyzer import analyze

K1 = 1.2
B = 0.75


class _FieldCSR:
    """Immutable scoring snapshot of one field's postings."""

    __slots__ = ("seg", "rows", "tfs", "doc_len", "n_docs", "avg_len")

    def __init__(self, post: dict[str, dict[int, int]],
                 lens: dict[int, int]):
        self.n_docs = len(lens)
        self.avg_len = (sum(lens.values()) / self.n_docs) if self.n_docs \
            else 0.0
        nnz = sum(len(p) for p in post.values())
        self.rows = np.empty(nnz, np.int64)
        self.tfs = np.empty(nnz, np.float64)
        self.seg: dict[str, tuple[int, int]] = {}
        at = 0
        for t, plist in post.items():
            n = len(plist)
            self.rows[at:at + n] = list(plist.keys())
            self.tfs[at:at + n] = list(plist.values())
            self.seg[t] = (at, at + n)
            at += n
        max_row = int(self.rows.max()) if nnz else -1
        self.doc_len = np.zeros(max_row + 1, np.float64)
        for r, dl in lens.items():
            if r <= max_row:
                self.doc_len[r] = dl


class BM25Index:
    def __init__(self, language: str = "english"):
        self.language = language
        # field → token → {row: tf}
        self.postings: dict[str, dict[str, dict[int, int]]] = {}
        # field → {row: doc_len}
        self.doc_lengths: dict[str, dict[int, int]] = {}
        # field → derived CSR snapshot (None = stale; rebuilt on demand).
        # Concurrent readers may race to rebuild — both build, last
        # atomic assignment wins (benign; engine RW lock serializes
        # writes against reads).
        self._csr: dict[str, _FieldCSR | None] = {}

    def fields(self) -> list[str]:
        return list(self.postings.keys())

    def add(self, row: int, field: str, text: str) -> None:
        tokens = analyze(text, self.language)
        if not tokens:
            return
        post = self.postings.setdefault(field, {})
        tf: dict[str, int] = defaultdict(int)
        for t in tokens:
            tf[t] += 1
        for t, c in tf.items():
            post.setdefault(t, {})[row] = c
        self.doc_lengths.setdefault(field, {})[row] = len(tokens)
        self._csr[field] = None

    def remove(self, row: int, field: str | None = None) -> None:
        fields = [field] if field else list(self.postings)
        for f in fields:
            post = self.postings.get(f, {})
            for t in list(post):
                post[t].pop(row, None)
                if not post[t]:
                    del post[t]
            self.doc_lengths.get(f, {}).pop(row, None)
            self._csr[f] = None

    def _snapshot(self, field: str) -> _FieldCSR | None:
        csr = self._csr.get(field)
        if csr is None:
            lens = self.doc_lengths.get(field, {})
            if not lens:
                return None
            csr = _FieldCSR(self.postings.get(field, {}), lens)
            self._csr[field] = csr
        return csr

    def search_arrays(self, query: str, fields: list[str] | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Union-of-postings BM25 (FindIDsByTextSearch, core.go:1965-2041),
        fully vectorized: each query term's posting segment scores as one
        numpy expression; segments aggregate with unique+bincount.
        Returns (rows ascending int64, scores float64)."""
        tokens = analyze(query, self.language)
        row_parts: list[np.ndarray] = []
        val_parts: list[np.ndarray] = []
        for f in fields or self.fields():
            csr = self._snapshot(f)
            if csr is None:
                continue
            for t in tokens:
                seg = csr.seg.get(t)
                if seg is None:
                    continue
                s, e = seg
                df = e - s
                idf = math.log(
                    1.0 + (csr.n_docs - df + 0.5) / (df + 0.5))
                rows = csr.rows[s:e]
                tfs = csr.tfs[s:e]
                dl = csr.doc_len[rows]
                denom = tfs + K1 * (1 - B + B * dl / csr.avg_len)
                row_parts.append(rows)
                val_parts.append(idf * tfs * (K1 + 1) / denom)
        if not row_parts:
            return (np.empty(0, np.int64), np.empty(0, np.float64))
        all_rows = np.concatenate(row_parts)
        all_vals = np.concatenate(val_parts)
        if len(row_parts) == 1:
            return all_rows, all_vals  # single segment: rows already unique
        span = int(all_rows.max()) + 1
        if all_rows.size * 8 >= span:
            # dense accumulate: O(nnz + span) beats the unique-sort
            # O(nnz log nnz) once postings cover >~1/8 of the row space
            dense = np.bincount(all_rows, weights=all_vals, minlength=span)
            uniq = np.nonzero(dense)[0]
            return uniq, dense[uniq]
        uniq, inv = np.unique(all_rows, return_inverse=True)
        return uniq, np.bincount(inv, weights=all_vals)

    def search(self, query: str, fields: list[str] | None = None
               ) -> dict[int, float]:
        """Dict view of search_arrays (unsorted; caller fuses/sorts)."""
        rows, vals = self.search_arrays(query, fields)
        return dict(zip(rows.tolist(), vals.tolist()))
