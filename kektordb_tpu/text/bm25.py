"""BM25 inverted text index.

Reference: pkg/core's per-index text machinery — posting lists
map[field]map[token]{DocID,TF} + TextIndexStats{TotalDocs, AvgFieldLength,
DocLengths} (core.go:908-951), scoring k1=1.2 b=0.75 (core.go:1958-1961),
IDF log(1+(N-df+0.5)/(df+0.5)) (core.go:2044-2068).

Postings are kept host-side as dicts (mutation-heavy), scoring is vectorized
numpy over the union of candidate docs; a Pallas CSR segment-reduce is the
planned optimization once corpora get large (SURVEY §7.2 kernel 5).
"""

from __future__ import annotations

import math
from collections import defaultdict

from .analyzer import analyze

K1 = 1.2
B = 0.75


class BM25Index:
    def __init__(self, language: str = "english"):
        self.language = language
        # field → token → {row: tf}
        self.postings: dict[str, dict[str, dict[int, int]]] = {}
        # field → {row: doc_len}
        self.doc_lengths: dict[str, dict[int, int]] = {}

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

    def remove(self, row: int, field: str | None = None) -> None:
        fields = [field] if field else list(self.postings)
        for f in fields:
            post = self.postings.get(f, {})
            for t in list(post):
                post[t].pop(row, None)
                if not post[t]:
                    del post[t]
            self.doc_lengths.get(f, {}).pop(row, None)

    def search(self, query: str, fields: list[str] | None = None
               ) -> dict[int, float]:
        """Union-of-postings BM25 (FindIDsByTextSearch, core.go:1965-2041).
        Returns {row: score} (unsorted; caller fuses/sorts)."""
        tokens = analyze(query, self.language)
        scores: dict[int, float] = defaultdict(float)
        for f in fields or self.fields():
            lens = self.doc_lengths.get(f, {})
            n_docs = len(lens)
            if not n_docs:
                continue
            avg_len = sum(lens.values()) / n_docs
            post = self.postings.get(f, {})
            for t in tokens:
                plist = post.get(t)
                if not plist:
                    continue
                df = len(plist)
                idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                for row, tf in plist.items():
                    dl = lens.get(row, 0)
                    denom = tf + K1 * (1 - B + B * dl / avg_len)
                    scores[row] += idf * tf * (K1 + 1) / denom
        return dict(scores)
