"""TUI driven end-to-end through a pty against a live server.

Reference model: the Bubble Tea dashboard (internal/tui) — 5 tabs, live
stats, search. This drives the curses TUI as a real subprocess with a
pseudo-terminal: tab switching, the search flow (/ → type → Enter), and
quit, asserting rendered screen content."""

import os
import pty
import re
import select
import subprocess
import time

import numpy as np
import pytest

from tests.test_http import ServerFixture


def _read_until(fd, pattern: str, timeout: float = 20.0) -> str:
    buf = b""
    deadline = time.time() + timeout
    while time.time() < deadline:
        r, _, _ = select.select([fd], [], [], 0.5)
        if fd in r:
            try:
                chunk = os.read(fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            text = _strip_ansi(buf.decode(errors="replace"))
            if re.search(pattern, text):
                return text
    return _strip_ansi(buf.decode(errors="replace"))


def _strip_ansi(s: str) -> str:
    return re.sub(r"\x1b\[[0-9;?]*[a-zA-Z]|\x1b[()][0-9A-B]", "", s)


def test_tui_end_to_end(tmp_path):
    srv = ServerFixture()
    try:
        rng = np.random.default_rng(0)
        e = srv.engine
        e.create_index("tuidx", m=8, metric="cosine")
        from kektordb_tpu.services.embeddings import HashingEmbedder
        emb = HashingEmbedder()
        texts = ["the sky is blue today", "vector databases on tpu",
                 "agents remember context"]
        e.add_batch("tuidx", [f"t{i}" for i in range(3)],
                    np.stack([emb.embed(t) for t in texts]),
                    [{"content": t, "_indexed_fields": ["content"]}
                     for t in texts])

        env = dict(os.environ)
        env.update({"TERM": "xterm-256color", "LINES": "30", "COLUMNS": "100",
                    "JAX_PLATFORMS": "cpu", "PYTHONUNBUFFERED": "1"})
        leader, follower = pty.openpty()
        proc = subprocess.Popen(
            ["python", "-m", "kektordb_tpu", "tui", "--url", srv.base],
            stdin=follower, stdout=follower, stderr=follower,
            env=env, cwd="/root/repo", close_fds=True)
        os.close(follower)
        try:
            # dashboard renders index stats
            text = _read_until(leader, r"tuidx")
            assert "KektorDB-TPU" in text
            assert "tuidx" in text
            text = _read_until(leader, r"connected")
            assert "connected" in text

            # settings tab shows the connection info
            os.write(leader, b"5")
            text = _read_until(leader, r"base url")
            assert srv.base in text

            # search flow: '/' enters typing mode, Enter runs the search
            os.write(leader, b"/")
            time.sleep(0.3)
            os.write(leader, b"sky blue")
            time.sleep(0.3)
            os.write(leader, b"\r")
            text = _read_until(leader, r"score=")
            assert "t0" in text          # top hit is the sky sentence

            # quit cleanly
            os.write(leader, b"q")
            proc.wait(timeout=10)
            assert proc.returncode == 0
        finally:
            if proc.poll() is None:
                proc.kill()
            os.close(leader)
    finally:
        srv.stop()
