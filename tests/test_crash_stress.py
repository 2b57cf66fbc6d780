"""Crash-kill recovery + concurrency stress.

Reference models: pkg/client/e2e_test.go SIGKILL restarts (SURVEY §5 fault
injection) and hnsw_stress_test.go TestConcurrencyChaos (mixed
add/search/delete storm under -race)."""

import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from kektordb_tpu.engine import Engine, EngineConfig

REPO = os.path.join(os.path.dirname(__file__), "..")

WRITER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
from kektordb_tpu.engine import Engine, EngineConfig

e = Engine(EngineConfig(data_dir=%(data)r, start_background=False)).open()
e.create_index("crash", m=8)
rng = np.random.default_rng(0)
X = rng.normal(size=(64, 8)).astype(np.float32)
e.add_batch("crash", [f"v{i}" for i in range(64)], X)
e.kv_set("phase", b"bulk-done")
e._aof.flush(fsync=True)
print("READY", flush=True)
# keep appending until killed; every write is journaled before RAM
i = 64
while True:
    e.add("crash", f"v{i}", rng.normal(size=8).astype(np.float32))
    e._aof.flush(fsync=True)
    print(f"W{i}", flush=True)
    i += 1
"""


def test_sigkill_recovery(tmp_path):
    """Kill -9 a writing engine process; reopen must recover everything the
    journal fsynced (AOF-before-RAM invariant survives a hard crash)."""
    data = str(tmp_path / "crashdata")
    proc = subprocess.Popen([sys.executable, "-c",
                             WRITER % {"repo": REPO, "data": data}],
                            stdout=subprocess.PIPE, text=True)
    written = 63
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            line = proc.stdout.readline().strip()
            if line.startswith("W"):
                written = int(line[1:])
                if written >= 80:
                    break
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=10)
    assert written >= 80, "writer never got going"

    e2 = Engine(EngineConfig(data_dir=data, start_background=False)).open()
    try:
        assert e2.kv_get("phase") == b"bulk-done"
        n = len(e2.indexes["crash"].index)
        # every acknowledged (fsynced) write must be present
        assert n >= written + 1, f"recovered {n}, wrote through v{written}"
        # and the index must actually serve
        got = e2.get("crash", f"v{written}")
        assert got["id"] == f"v{written}"
    finally:
        e2.close()


def test_concurrency_chaos():
    """Mixed add/search/delete storm across threads — the engine must stay
    consistent (single-writer lock; searches never see corrupt state)."""
    e = Engine(EngineConfig(start_background=False)).open()
    e.create_index("chaos", m=8)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 8)).astype(np.float32)
    e.add_batch("chaos", [f"seed{i}" for i in range(200)], X[:200])

    errors: list[Exception] = []
    stop = threading.Event()

    def adder():
        i = 0
        while not stop.is_set():
            try:
                e.add("chaos", f"a{threading.get_ident()}_{i}",
                      X[(200 + i) % 400])
                i += 1
            except KeyError:
                pass
            except Exception as ex:  # noqa: BLE001
                errors.append(ex)
                return

    def searcher():
        while not stop.is_set():
            try:
                hits = e.search("chaos", X[rng.integers(0, 400)], k=5)
                assert isinstance(hits[0], list)
            except Exception as ex:  # noqa: BLE001
                errors.append(ex)
                return

    def deleter():
        i = 0
        while not stop.is_set():
            try:
                e.delete("chaos", f"seed{i % 200}")
                i += 1
            except Exception as ex:  # noqa: BLE001
                errors.append(ex)
                return

    threads = ([threading.Thread(target=adder) for _ in range(2)]
               + [threading.Thread(target=searcher) for _ in range(3)]
               + [threading.Thread(target=deleter)])
    for t in threads:
        t.start()
    time.sleep(8.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, f"concurrency errors: {errors[:3]}"
    # engine still fully functional afterwards
    hits = e.search("chaos", X[0], k=3)
    assert len(hits[0]) == 3
    e.run_maintenance()


def test_chaos_with_background_maintenance(tmp_path):
    """Mixed add/search/delete storm with the background maintenance thread
    RUNNING (snapshot ticks + link-backlog drains + vacuum) against the
    two-stage insert path — the engine-lock serialization must keep the
    donated device buffers consistent (reference TestConcurrencyChaos +
    optimizer_concurrent_test.go, run live rather than simulated)."""
    e = Engine(EngineConfig(data_dir=str(tmp_path),
                            start_background=True,
                            snapshot_interval=1.0,
                            snapshot_dirty_threshold=50,
                            maintenance_interval=0.5)).open()
    e.create_index("chaos", m=8)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 16)).astype(np.float32)
    e.add_batch("chaos", [f"seed{i}" for i in range(128)], X[:128])

    errors: list[BaseException] = []
    stop = threading.Event()

    def adder():
        i = 0
        try:
            while not stop.is_set():
                e.add("chaos", f"a{i}", X[(128 + i) % 512])
                i += 1
        except BaseException as ex:
            errors.append(ex)

    def searcher():
        try:
            while not stop.is_set():
                hits = e.search("chaos", X[rng.integers(0, 512)], k=5)
                assert isinstance(hits[0], list)
        except BaseException as ex:
            errors.append(ex)

    def deleter():
        j = 0
        try:
            while not stop.is_set():
                e.delete("chaos", f"a{j}")
                j += 2
                time.sleep(0.005)
        except BaseException as ex:
            errors.append(ex)

    threads = [threading.Thread(target=f)
               for f in (adder, searcher, searcher, deleter)]
    for t in threads:
        t.start()
    time.sleep(8.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors[:2]

    # engine still consistent: search finds a live seed, snapshot works
    hits = e.search("chaos", X[5], k=1)[0]
    assert hits and hits[0]["id"] == "seed5"
    e.save_snapshot()
    e.close()
    # and the data survives a reopen
    e2 = Engine(EngineConfig(data_dir=str(tmp_path),
                             start_background=False)).open()
    assert e2.search("chaos", X[5], k=1)[0][0]["id"] == "seed5"
    e2.close()


def test_sigkill_mid_stage_backlog(tmp_path):
    """SIGKILL while the index holds a staged-but-unlinked backlog: replay
    must restore every journaled add and the backlog must drain cleanly on
    the reopened engine (beam search works after)."""
    data = str(tmp_path / "stagedata")
    # the writer runs without background maintenance, so its streaming adds
    # accumulate as staged/host-pending backlog (auto mode links lazily)
    writer = WRITER % {"repo": REPO, "data": data}
    proc = subprocess.Popen([sys.executable, "-c", writer],
                            stdout=subprocess.PIPE, text=True)
    written = 63
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            line = proc.stdout.readline().strip()
            if line.startswith("W"):
                written = int(line[1:])
                if written >= 80:
                    break
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    assert written >= 80

    e = Engine(EngineConfig(data_dir=data, start_background=False)).open()
    idx = e.indexes["crash"].index
    assert len(idx) >= written  # every fsynced add recovered
    # scan path sees everything
    import numpy as np
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    assert e.search("crash", X[7], k=1)[0][0]["id"] == "v7"
    # beam path drains the link backlog and also works
    d, rows = idx.search(X[7][None], 1, mode="beam")
    assert idx.ids.row_to_ext[int(rows[0, 0])] == "v7"
    assert not idx._unlinked
    e.close()
