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


class _PtyReader:
    """Cumulative pty transcript: curses emits screen DIFFS, so a pattern
    may arrive in the same chunk as an earlier match — sequential fresh
    reads would then block forever on output that already went by."""

    def __init__(self, fd):
        self.fd = fd
        self.buf = b""

    def until(self, pattern: str, timeout: float = 20.0) -> str:
        deadline = time.time() + timeout
        while True:
            text = _strip_ansi(self.buf.decode(errors="replace"))
            if re.search(pattern, text) or time.time() >= deadline:
                return text
            r, _, _ = select.select([self.fd], [], [], 0.5)
            if self.fd in r:
                try:
                    chunk = os.read(self.fd, 65536)
                except OSError:
                    return text
                if not chunk:
                    return text
                self.buf += chunk


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
        rd = _PtyReader(leader)
        try:
            # dashboard renders index stats
            text = rd.until(r"tuidx")
            assert "KektorDB-TPU" in text
            assert "tuidx" in text
            text = rd.until(r"connected")
            assert "connected" in text

            # settings tab shows the connection info
            os.write(leader, b"5")
            text = rd.until(r"base url")
            assert srv.base in text

            # search flow: '/' enters typing mode, Enter runs the search
            os.write(leader, b"/")
            time.sleep(0.3)
            os.write(leader, b"sky blue")
            time.sleep(0.3)
            os.write(leader, b"\r")
            text = rd.until(r"score=")
            assert "t0" in text          # top hit is the sky sentence

            # Enter on the selected hit jumps to the graph detail view
            os.write(leader, b"\r")
            text = rd.until(r"out edges")
            assert "node t0" in text

            # graph tab: back out of detail, load + navigate the node list
            os.write(leader, b"b")
            time.sleep(0.2)
            os.write(leader, b"r")
            text = rd.until(r"nodes loaded")
            assert "tuidx" in text

            # timeline tab: filter cycles render
            os.write(leader, b"4")
            text = rd.until(r"filter: all")
            # curses redraws only the changed cells, so the transcript
            # shows the diff fragment, not the full header string
            os.write(leader, b"f")
            text = rd.until(r"vector\s+\[live\]")
            assert re.search(r"vector\s+\[live\]", text)

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


def test_tui_survives_short_terminal():
    """Settings tab writes fixed rows (8-10): on a terminal shorter than
    the layout the draw must clip, not crash the loop (curses.error)."""
    srv = ServerFixture()
    try:
        env = dict(os.environ)
        env.update({"TERM": "xterm-256color", "LINES": "7", "COLUMNS": "60",
                    "JAX_PLATFORMS": "cpu", "PYTHONUNBUFFERED": "1"})
        leader, follower = pty.openpty()
        proc = subprocess.Popen(
            ["python", "-m", "kektordb_tpu", "tui", "--url", srv.base],
            stdin=follower, stdout=follower, stderr=follower,
            env=env, cwd="/root/repo", close_fds=True)
        os.close(follower)
        rd = _PtyReader(leader)
        try:
            rd.until(r"KektorDB-TPU")
            os.write(leader, b"5")      # settings: fixed rows > h-2
            time.sleep(1.5)
            assert proc.poll() is None  # loop survived the short frame
            os.write(leader, b"q")
            proc.wait(timeout=10)
            assert proc.returncode == 0
        finally:
            if proc.poll() is None:
                proc.kill()
            os.close(leader)
    finally:
        srv.stop()
