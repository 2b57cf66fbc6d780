"""Concurrent serving: readers run in parallel, writers stay exclusive.

The rebuild's replacement for the reference's -race suite on the serving
path (hnsw_stress_test.go:16 TestConcurrencyChaos; readers-during-writes,
hnsw_index.go:71): N reader threads hammer Engine.search while writer
threads add/delete/update — no torn state, no deleted-buffer crashes,
results always self-consistent."""

import threading
import time

import numpy as np
import pytest

from kektordb_tpu.engine import Engine, EngineConfig
from kektordb_tpu.engine.locks import RWLock


class TestRWLock:
    def test_readers_concurrent(self):
        lock = RWLock()
        inside = []
        barrier = threading.Barrier(4, timeout=5)

        def reader():
            with lock.read():
                barrier.wait()       # all 4 must be inside simultaneously
                inside.append(1)

        ts = [threading.Thread(target=reader) for _ in range(4)]
        [t.start() for t in ts]
        [t.join(timeout=10) for t in ts]
        assert len(inside) == 4

    def test_writer_excludes_readers(self):
        lock = RWLock()
        log = []

        def writer():
            with lock:
                log.append("w-in")
                time.sleep(0.05)
                log.append("w-out")

        def reader():
            time.sleep(0.01)         # start after the writer holds it
            with lock.read():
                log.append("r")

        tw = threading.Thread(target=writer)
        tr = threading.Thread(target=reader)
        tw.start()
        tr.start()
        tw.join(timeout=10)
        tr.join(timeout=10)
        assert log == ["w-in", "w-out", "r"]

    def test_reentrant_write_and_read_in_write(self):
        lock = RWLock()
        with lock:
            with lock:                # reentrant write
                with lock.read():     # read inside write
                    pass

    def test_nested_read_does_not_deadlock_with_waiting_writer(self):
        lock = RWLock()
        done = []

        def reader():
            with lock.read():
                time.sleep(0.05)      # give the writer time to queue
                with lock.read():     # must NOT wait behind the writer
                    done.append("inner")

        def writer():
            time.sleep(0.01)
            with lock:
                done.append("write")

        tr = threading.Thread(target=reader)
        tw = threading.Thread(target=writer)
        tr.start()
        tw.start()
        tr.join(timeout=10)
        tw.join(timeout=10)
        assert done == ["inner", "write"]

    def test_upgrade_rejected(self):
        lock = RWLock()
        with lock.read():
            with pytest.raises(RuntimeError):
                with lock:
                    pass


@pytest.mark.slow
def test_engine_concurrent_mixed_load(tmp_path):
    rng = np.random.default_rng(0)
    dim = 16
    X = rng.normal(size=(600, dim)).astype(np.float32)
    e = Engine(EngineConfig(data_dir=str(tmp_path),
                            start_background=False)).open()
    e.create_index("c", m=8)
    e.add_batch("c", [f"v{i}" for i in range(600)], X,
                metadatas=[{"grp": i % 4} for i in range(600)])

    stop = threading.Event()
    errors: list[BaseException] = []
    reads = [0]
    writes = [0]

    def reader(seed):
        r = np.random.default_rng(seed)
        try:
            while not stop.is_set():
                q = X[r.integers(0, 600)]
                res = e.search("c", q, k=5,
                               filter="grp = 1" if seed % 2 else None)[0]
                for hit in res:
                    assert isinstance(hit["id"], str)
                    assert np.isfinite(hit["score"])
                reads[0] += 1
        except BaseException as exc:   # noqa: BLE001
            errors.append(exc)

    def writer(seed):
        r = np.random.default_rng(1000 + seed)
        try:
            i = 0
            while not stop.is_set():
                op = r.integers(0, 3)
                if op == 0:
                    e.add("c", f"w{seed}-{i}",
                          r.normal(size=dim).astype(np.float32),
                          {"grp": int(r.integers(0, 4)),
                           "body": f"tok{i % 64} alpha note",
                           "_indexed_fields": ["body"]})
                elif op == 1:
                    e.delete("c", f"v{int(r.integers(0, 600))}")
                else:
                    e.update_metadata("c", f"v{int(r.integers(0, 600))}",
                                      {"grp": int(r.integers(0, 4))})
                writes[0] += 1
                i += 1
                time.sleep(0.002)
        except KeyError:
            pass                       # double-delete / missing id: fine
        except BaseException as exc:   # noqa: BLE001
            errors.append(exc)

    def poller():
        # index_info iterates the text index's write-hot dicts; it must
        # hold the read lock or this races writers (regression: r3)
        try:
            while not stop.is_set():
                info = e.index_info("c")
                assert info["size"] >= 0
                for st in info["text"].values():
                    assert st["docs"] >= 0
                time.sleep(0.003)
        except BaseException as exc:   # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=reader, args=(s,)) for s in range(4)]
    threads += [threading.Thread(target=writer, args=(s,)) for s in range(2)]
    threads += [threading.Thread(target=poller)]
    [t.start() for t in threads]
    time.sleep(6.0)
    stop.set()
    [t.join(timeout=30) for t in threads]
    e.close()
    assert not errors, errors[:3]
    assert reads[0] > 20 and writes[0] > 20, (reads, writes)
