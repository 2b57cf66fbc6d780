"""ctypes bindings for the C++ host runtime (kektor_native.cpp).

Compiled on first import with g++ (cached as kektor_native.so next to the
source); every entry point has a pure-Python/numpy fallback so the package
works without a toolchain. See kektor_native.cpp for what lives here and why.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import zlib
from typing import Optional

import numpy as np

log = logging.getLogger("kektordb.native")

_SRC = os.path.join(os.path.dirname(__file__), "kektor_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "kektor_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        out = subprocess.run(cmd, capture_output=True, timeout=180)
        if out.returncode != 0:
            log.warning("native build failed: %s",
                        out.stderr.decode()[:500])
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("native build unavailable: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        log.warning("native load failed: %s", e)
        return None
    i64, f32p, i32p, u8p = (ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int32),
                            ctypes.POINTER(ctypes.c_uint8))
    lib.kn_crc32.restype = ctypes.c_uint32
    lib.kn_crc32.argtypes = [u8p, i64, ctypes.c_uint32]
    lib.kn_scan_frames.restype = i64
    lib.kn_scan_frames.argtypes = [u8p, i64, i64,
                                   ctypes.POINTER(i64),
                                   ctypes.POINTER(i64), u8p,
                                   ctypes.POINTER(i64)]
    lib.kn_bruteforce_topk.argtypes = [f32p, i64, f32p, i64, i64, i64,
                                       ctypes.c_int, i32p, f32p]
    lib.kn_arena_write.restype = ctypes.c_int
    lib.kn_arena_write.argtypes = [ctypes.c_char_p, f32p, i64, i64]
    lib.kn_arena_read.restype = ctypes.c_int
    lib.kn_arena_read.argtypes = [ctypes.c_char_p, i64, i64, f32p,
                                  ctypes.POINTER(i64), ctypes.POINTER(i64)]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# high-level wrappers (with numpy fallbacks)
# ---------------------------------------------------------------------------

def crc32(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is None:
        return zlib.crc32(data, seed) & 0xFFFFFFFF
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    return int(lib.kn_crc32(buf, len(data), seed))


def scan_frames(buf: bytes, max_frames: int = 1 << 22
                ) -> tuple[list[tuple[int, int, int]], int]:
    """[(payload_offset, payload_len, opcode)], corrupt_regions."""
    lib = get_lib()
    if lib is None:
        return _scan_frames_py(buf)
    n = len(buf)
    cbuf = (ctypes.c_uint8 * n).from_buffer_copy(buf)
    offs = (ctypes.c_int64 * max_frames)()
    lens = (ctypes.c_int64 * max_frames)()
    ops = (ctypes.c_uint8 * max_frames)()
    corrupt = ctypes.c_int64(0)
    found = lib.kn_scan_frames(cbuf, n, max_frames, offs, lens, ops,
                               ctypes.byref(corrupt))
    return ([(offs[i], lens[i], ops[i]) for i in range(found)],
            int(corrupt.value))


def _scan_frames_py(buf: bytes) -> tuple[list[tuple[int, int, int]], int]:
    from ..persist.aof import FrameError, decode_frame
    out = []
    corrupt = 0
    pos = 0
    n = len(buf)
    while pos < n:
        try:
            opcode, payload, nxt = decode_frame(buf, pos)
            out.append((nxt - len(payload), len(payload), opcode))
            pos = nxt
        except FrameError:
            corrupt += 1
            nxt_pos = None
            scan = pos + 1
            while scan < n:
                scan = buf.find(b"\xa5", scan)
                if scan < 0:
                    break
                try:
                    decode_frame(buf, scan)
                    nxt_pos = scan
                    break
                except FrameError:
                    scan += 1
            if nxt_pos is None:
                break
            pos = nxt_pos
    return out, corrupt


def bruteforce_topk(queries: np.ndarray, rows: np.ndarray, k: int,
                    metric: str = "euclidean"
                    ) -> tuple[np.ndarray, np.ndarray]:
    """CPU exact top-k — the host parity oracle."""
    queries = np.ascontiguousarray(queries, np.float32)
    rows = np.ascontiguousarray(rows, np.float32)
    b, d = queries.shape
    n = rows.shape[0]
    k = min(k, max(n, 1))
    lib = get_lib()
    if lib is None:
        if metric == "euclidean":
            dists = ((queries[:, None, :] - rows[None, :, :]) ** 2).sum(-1)
        else:
            dists = 1.0 - queries @ rows.T
        idx = np.argsort(dists, axis=1)[:, :k].astype(np.int32)
        return np.take_along_axis(dists, idx, 1).astype(np.float32), idx
    idx = np.empty((b, k), np.int32)
    dst = np.empty((b, k), np.float32)
    lib.kn_bruteforce_topk(
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
        0 if metric == "euclidean" else 1,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst, idx


def arena_write(path: str, data: np.ndarray) -> None:
    data = np.ascontiguousarray(data, np.float32)
    lib = get_lib()
    if lib is None:
        with open(path, "wb") as f:
            header = np.zeros(16, np.uint32)
            header[0] = 0x4B544E41
            header[1] = 1
            header[2] = data.shape[1]
            header[4:6] = np.frombuffer(
                np.int64(data.shape[0]).tobytes(), np.uint32)
            f.write(header.tobytes())
            f.write(data.tobytes())
        return
    rc = lib.kn_arena_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1])
    if rc != 0:
        raise OSError(f"arena write failed rc={rc}")


def arena_read(path: str, row_start: int = 0,
               count: int = -1) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            header = np.frombuffer(f.read(64), np.uint32)
            if header[0] != 0x4B544E41:
                raise OSError("bad arena magic")
            dim = int(header[2])
            rows = int(np.frombuffer(header[4:6].tobytes(), np.int64)[0])
            if count < 0:
                count = rows - row_start
            f.seek(64 + row_start * dim * 4)
            return np.frombuffer(
                f.read(count * dim * 4), np.float32).reshape(count, dim)
    dim = ctypes.c_int64(0)
    rows = ctypes.c_int64(0)
    rc = lib.kn_arena_read(path.encode(), 0, 0, None,
                           ctypes.byref(dim), ctypes.byref(rows))
    if rc != 0:
        raise OSError(f"arena read failed rc={rc}")
    if count < 0:
        count = rows.value - row_start
    out = np.empty((count, dim.value), np.float32)
    rc = lib.kn_arena_read(
        path.encode(), row_start, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(dim), ctypes.byref(rows))
    if rc != 0:
        raise OSError(f"arena read failed rc={rc}")
    return out
