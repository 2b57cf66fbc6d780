"""Text-analysis + persistence primitives.

Reference models: stemmer_english_test.go, aof_writer_test.go,
lazy_aof_test.go, frame round-trip tests."""

import os

import pytest

from kektordb_tpu.persist import aof as aoflib
from kektordb_tpu.persist.resp import RESPError, format_command, parse_command
from kektordb_tpu.text import analyze, stem_english, stem_italian, tokenize
from kektordb_tpu.text.bm25 import BM25Index


class TestStemmers:
    def test_porter2_pins(self):
        cases = {
            "running": "run", "consolidation": "consolid",
            "national": "nation", "flies": "fli", "agreed": "agre",
            "happily": "happili", "generalization": "general",
            "cats": "cat", "knowledge": "knowledg", "dying": "die",
            "news": "news", "sky": "sky",
        }
        for w, want in cases.items():
            assert stem_english(w) == want, w

    def test_italian_pins(self):
        assert stem_italian("abbandonata") == stem_italian("abbandonate")
        assert stem_italian("informazione") == stem_italian("informazioni")
        assert stem_italian("pericolosa") == stem_italian("pericolose")

    def test_analyze_drops_stopwords(self):
        toks = analyze("the quick brown fox and the lazy dog")
        assert "the" not in toks and "and" not in toks
        assert "quick" in toks

    def test_tokenize_alnum(self):
        assert tokenize("Hello, World! x2") == ["hello", "world", "x2"]


class TestBM25:
    def test_ranking(self):
        idx = BM25Index()
        idx.add(1, "body", "vector database engine for vectors")
        idx.add(2, "body", "cats and dogs")
        idx.add(3, "body", "the vector is a mathematical object")
        scores = idx.search("vector database")
        assert scores[1] > scores[3] > 0
        assert 2 not in scores

    def test_remove(self):
        idx = BM25Index()
        idx.add(1, "body", "alpha beta")
        idx.remove(1)
        assert idx.search("alpha") == {}

    def test_multi_field(self):
        idx = BM25Index()
        idx.add(1, "title", "jax tpu kernels")
        idx.add(2, "body", "kernels for linux")
        assert set(idx.search("kernels")) == {1, 2}
        assert set(idx.search("kernels", fields=["title"])) == {1}

    def test_add_is_upsert_and_remove_is_row_local(self):
        """add() replaces a row's previous postings (reverse-map upsert);
        remove() touches only the row's own tokens, not the vocab."""
        idx = BM25Index()
        idx.add(1, "body", "alpha beta")
        idx.add(1, "body", "gamma")          # upsert: alpha/beta drop
        assert set(idx.search("alpha")) == set()
        assert set(idx.search("gamma")) == {1}
        assert idx.stats()["body"] == {
            "docs": 1, "avg_len": 1.0, "vocab": 1, "postings": 1}
        idx.add(2, "body", "gamma delta")
        idx.remove(1)
        assert set(idx.search("gamma")) == {2}
        assert 1 not in idx._row_tokens["body"]
        # upsert to stopword-only text removes the row from the field
        idx.add(2, "body", "the and of")
        assert idx.search("gamma") == {} and idx.search("delta") == {}
        assert idx.stats()["body"]["docs"] == 0

    def test_delta_fold_threshold(self, monkeypatch):
        """Writes past the fold threshold collapse the delta into a fresh
        snapshot; scoring stays correct on both sides of the fold."""
        from kektordb_tpu.text import bm25 as bm25mod
        monkeypatch.setattr(bm25mod, "_FOLD_MIN", 4)
        idx = BM25Index()
        for r in range(8):
            idx.add(r, "body", f"alpha w{r}")
        idx.search_arrays("alpha")              # snapshot
        for r in range(8, 14):                  # 6 writes > max(4, 14//8)
            idx.add(r, "body", f"alpha w{r}")
        assert idx._csr.get("body") is None     # folded (stale)
        rows, _ = idx.search_arrays("alpha")    # rebuilt
        assert rows.tolist() == list(range(14))
        assert idx._delta.get("body") is None or \
            not idx._delta["body"].rows

    def test_vectorized_matches_reference_scorer(self):
        """CSR search_arrays == straightforward per-posting BM25 walk
        (core.go:1965-2041 semantics), across mutations that invalidate
        the cached snapshot."""
        import math
        import random
        import numpy as np

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(40)]
        idx = BM25Index()
        docs = {}
        for row in range(120):
            words = rng.choices(vocab, k=rng.randint(3, 12))
            docs[row] = " ".join(words)
            idx.add(row, "body", docs[row])
        idx.search_arrays(vocab[0])          # build the CSR snapshot
        for row in (5, 50, 99):              # mutate → snapshot stale
            idx.remove(row)
            del docs[row]
        idx.add(200, "body", "w1 w1 w1 w2")
        docs[200] = "w1 w1 w1 w2"

        def reference(query):
            from kektordb_tpu.text.analyzer import analyze
            toks = analyze(query, "english")
            lens = idx.doc_lengths["body"]
            n, avg = len(lens), sum(lens.values()) / len(lens)
            out = {}
            for t in toks:
                plist = idx.postings["body"].get(t, {})
                if not plist:
                    continue
                df = len(plist)
                w = math.log(1 + (n - df + 0.5) / (df + 0.5))
                for r, tf in plist.items():
                    dl = lens[r]
                    out[r] = out.get(r, 0.0) + \
                        w * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avg))
            return out

        for q in ("w1 w2", "w3", "w1 w1 w5 w9", "missingtoken"):
            rows, vals = idx.search_arrays(q)
            want = reference(q)
            assert rows.tolist() == sorted(want)
            got = dict(zip(rows.tolist(), vals.tolist()))
            for r, s in want.items():
                assert abs(got[r] - s) < 1e-9 * max(1.0, abs(s))
            assert np.all(np.diff(rows) > 0)


class TestRESP:
    def test_roundtrip_binary_safe(self):
        parts = [b"VADD", b"idx", b"id1", bytes(range(256)), b""]
        enc = format_command(*parts)
        assert parse_command(enc) == parts

    def test_malformed(self):
        with pytest.raises(RESPError):
            parse_command(b"+OK\r\n")
        with pytest.raises(RESPError):
            parse_command(b"*2\r\n$3\r\nabc\r\n$5\r\nxy\r\n")


class TestAOF:
    def test_frame_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.aof")
        w = aoflib.AOFWriter(p)
        w.write(b"one")
        w.write(b"two", opcode=7)
        w.close()
        frames = list(aoflib.read_frames(p))
        assert frames == [(aoflib.OP_COMMAND, b"one"), (7, b"two")]

    def test_resync_after_corruption(self, tmp_path):
        p = str(tmp_path / "a.aof")
        w = aoflib.AOFWriter(p)
        for i in range(10):
            w.write(b"payload-%d" % i)
        w.close()
        size = os.path.getsize(p)
        with open(p, "r+b") as f:
            f.seek(size // 2)
            f.write(b"\x00" * 4)
        hits = []
        got = [pl for _, pl in aoflib.read_frames(p, hits.append)]
        assert hits, "corruption must be reported"
        assert got[0] == b"payload-0"
        assert b"payload-9" in got  # frames after the corruption recovered

    def test_lazy_writer_shadow_buffer(self, tmp_path):
        p = str(tmp_path / "l.aof")
        w = aoflib.LazyAOFWriter(p)
        w.write(b"before")
        w.begin_snapshot_mode()
        w.write(b"during")            # diverted to shadow
        w.truncate()
        shadow = w.end_snapshot_mode()
        w.write_raw_frames(shadow)
        w.write(b"after")
        w.close()
        payloads = [pl for _, pl in aoflib.read_frames(p)]
        assert payloads == [b"during", b"after"]

    def test_lazy_writer_buffer_cap_flush(self, tmp_path):
        p = str(tmp_path / "c.aof")
        w = aoflib.LazyAOFWriter(p)
        for i in range(aoflib.LazyAOFWriter.BUFFER_CAP + 5):
            w.write(b"x%d" % i)
        # cap-triggered inline flush must have hit the file already
        assert os.path.getsize(p) > 0
        w.close()
        assert len(list(aoflib.read_frames(p))) == \
            aoflib.LazyAOFWriter.BUFFER_CAP + 5
