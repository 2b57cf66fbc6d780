"""Binary-framed append-only journal with CRC validation and resync recovery.

Reference: pkg/persistence/frame.go:12-28 — frame layout
[Magic 0xA5][OpCode u8][PayloadLen u32][CRC32 u32][payload]; ReadFrame
validates magic+CRC with a 1 GB payload cap (frame.go:87-131).
LazyAOFWriter (lazy_aof.go:36-113): buffered writer goroutine → here a
daemon thread; flush 100 ms / fsync 1 s / 1000-entry cap; snapshot mode
diverts writes to an in-memory shadow buffer (lazy_aof.go:248-268).

In the TPU rebuild the journal only carries streaming mutations between
dense-array checkpoints (SURVEY §5 checkpoint/resume), so it stays small and
replay is cheap.
"""

from __future__ import annotations

import io
import os
import struct
import threading
import time
import zlib
from typing import Callable, Iterator, Optional

MAGIC = 0xA5
_HEADER = struct.Struct("<BBII")   # magic, opcode, payload_len, crc32
MAX_PAYLOAD = 1 << 30

OP_COMMAND = 1


class FrameError(ValueError):
    pass


def encode_frame(payload: bytes, opcode: int = OP_COMMAND) -> bytes:
    if len(payload) > MAX_PAYLOAD:
        raise FrameError("payload exceeds 1GB cap")
    return _HEADER.pack(MAGIC, opcode, len(payload),
                        zlib.crc32(payload) & 0xFFFFFFFF) + payload


def decode_frame(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """Returns (opcode, payload, next_pos); raises FrameError on corruption."""
    if pos + _HEADER.size > len(buf):
        raise FrameError("truncated header")
    magic, opcode, ln, crc = _HEADER.unpack_from(buf, pos)
    if magic != MAGIC:
        raise FrameError("bad magic")
    if ln > MAX_PAYLOAD:
        raise FrameError("payload exceeds 1GB cap")
    start = pos + _HEADER.size
    end = start + ln
    if end > len(buf):
        raise FrameError("truncated payload")
    payload = buf[start:end]
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise FrameError("crc mismatch")
    return opcode, payload, end


def read_frames(path: str,
                on_corruption: Optional[Callable[[int], None]] = None
                ) -> Iterator[tuple[int, bytes]]:
    """Frame-by-frame read with resync: on corruption, scan forward for the
    next valid magic+CRC+parseable frame (resyncAOF, recovery.go:32-67).
    Uses the C++ scanner (native/kektor_native.cpp kn_scan_frames) when
    available so replay is IO-bound."""
    try:
        with open(path, "rb") as f:
            buf = f.read()
    except FileNotFoundError:
        return
    try:
        from ..native import available, scan_frames
        if available():
            frames, corrupt = scan_frames(buf)
            if corrupt and on_corruption:
                on_corruption(-1)
            for off, ln, opcode in frames:
                yield opcode, buf[off:off + ln]
            return
    except Exception:
        pass  # fall through to the pure-Python scanner
    pos = 0
    n = len(buf)
    while pos < n:
        try:
            opcode, payload, nxt = decode_frame(buf, pos)
            yield opcode, payload
            pos = nxt
        except FrameError:
            if on_corruption:
                on_corruption(pos)
            # resync: find next candidate magic byte that decodes cleanly
            scan = pos + 1
            while scan < n:
                scan = buf.find(bytes([MAGIC]), scan)
                if scan < 0:
                    return
                try:
                    decode_frame(buf, scan)
                    break
                except FrameError:
                    scan += 1
            if scan < 0 or scan >= n:
                return
            pos = scan


class AOFWriter:
    """Synchronous framed writer (pkg/persistence/aof.go:34)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "ab")

    def write(self, payload: bytes, opcode: int = OP_COMMAND) -> None:
        self._f.write(encode_frame(payload, opcode))

    def flush(self, fsync: bool = False) -> None:
        self._f.flush()
        if fsync:
            os.fsync(self._f.fileno())

    def size(self) -> int:
        self._f.flush()
        return os.path.getsize(self.path)

    def truncate(self) -> None:
        self._f.close()
        self._f = open(self.path, "wb")

    def replace_with(self, tmp_path: str) -> None:
        """Atomic swap used by AOF rewrite (RewriteAOF, recovery.go:573+)."""
        self._f.close()
        os.replace(tmp_path, self.path)
        self._f = open(self.path, "ab")

    def close(self) -> None:
        self._f.flush()
        self._f.close()


class LazyAOFWriter:
    """Batched async writer: single daemon thread drains a bounded buffer.

    Mirrors lazy_aof.go semantics: writes enqueue without blocking the write
    path; flush every `flush_interval`; fsync every `fsync_interval`; a full
    buffer forces an inline flush. During snapshot mode writes divert to a
    shadow buffer returned by end_snapshot_mode (lazy_aof.go:248-268).
    """

    FLUSH_INTERVAL = 0.1
    FSYNC_INTERVAL = 1.0
    BUFFER_CAP = 1000

    def __init__(self, path: str):
        self._inner = AOFWriter(path)
        self._buf: list[bytes] = []
        self._shadow: Optional[list[bytes]] = None
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._last_fsync = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @property
    def path(self) -> str:
        return self._inner.path

    def write(self, payload: bytes, opcode: int = OP_COMMAND) -> None:
        frame = encode_frame(payload, opcode)
        with self._lock:
            if self._shadow is not None:
                self._shadow.append(frame)
                return
            self._buf.append(frame)
            full = len(self._buf) >= self.BUFFER_CAP
        if full:
            self.flush()

    def flush(self, fsync: bool = False) -> None:
        with self._lock:
            buf, self._buf = self._buf, []
        if buf:
            self._inner._f.write(b"".join(buf))
        self._inner.flush(fsync=fsync)

    def _run(self) -> None:
        while not self._stop:
            self._wake.wait(self.FLUSH_INTERVAL)
            self._wake.clear()
            if self._stop:
                break
            now = time.monotonic()
            do_sync = now - self._last_fsync >= self.FSYNC_INTERVAL
            if do_sync:
                self._last_fsync = now
            try:
                self.flush(fsync=do_sync)
            except ValueError:
                return  # underlying file swapped/closed mid-shutdown

    # -- snapshot coordination (shadow buffer) -------------------------------

    def begin_snapshot_mode(self) -> None:
        self.flush(fsync=True)
        with self._lock:
            self._shadow = []

    def end_snapshot_mode(self) -> list[bytes]:
        with self._lock:
            shadow, self._shadow = self._shadow or [], None
        return shadow

    def write_raw_frames(self, frames: list[bytes]) -> None:
        """Replay already-encoded frames (shadow-buffer drain after a
        snapshot, recovery.go:477-557)."""
        if frames:
            self._inner._f.write(b"".join(frames))
        self._inner.flush(fsync=True)

    def size(self) -> int:
        return self._inner.size()

    def truncate(self) -> None:
        with self._lock:
            self._buf.clear()
        self._inner.truncate()

    def replace_with(self, tmp_path: str) -> None:
        self.flush()
        self._inner.replace_with(tmp_path)

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=2.0)
        self.flush(fsync=True)
        self._inner.close()
