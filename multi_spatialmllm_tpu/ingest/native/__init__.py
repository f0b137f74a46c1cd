"""ctypes bindings for the native ingestion helpers (libmsm_native.so).

The C++ library (src/msm_native.cpp, built by build.sh) provides single and
multithreaded-batch zlib inflate for .sens depth streams. Everything here
degrades gracefully to the Python zlib module when the library has not
been built — the native path is a throughput optimization, not a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmsm_native.so")
_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library (idempotent)."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["bash", os.path.join(os.path.dirname(__file__), "build.sh")],
            check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.msm_inflate.restype = ctypes.c_int
    lib.msm_inflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t)]
    lib.msm_inflate_batch.restype = ctypes.c_int
    lib.msm_inflate_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_size_t, ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def zlib_inflate(data: bytes, expected_size: int | None = None) -> bytes:
    """Inflate one stream; native when built, Python zlib otherwise."""
    lib = _load()
    if lib is None:
        return zlib.decompress(data)
    cap = expected_size if expected_size else max(16, len(data) * 20)
    while True:
        dst = ctypes.create_string_buffer(cap)
        out_len = ctypes.c_size_t(0)
        rc = lib.msm_inflate(data, len(data), dst, cap,
                             ctypes.byref(out_len))
        if rc == 0:
            return dst.raw[: out_len.value]
        if rc == -5 and expected_size is None:  # Z_BUF_ERROR: grow
            cap *= 4
            continue
        return zlib.decompress(data)  # fall back on any other error


def zlib_inflate_batch(
    streams: list[bytes],
    expected_size: int,
    n_threads: int | None = None,
) -> list[bytes]:
    """Inflate many same-capacity streams concurrently (depth frames all
    decompress to depth_h*depth_w*2 bytes)."""
    lib = _load()
    if lib is None:
        return [zlib.decompress(s) for s in streams]
    if n_threads is None:
        n_threads = min(os.cpu_count() or 4, 16)
    n = len(streams)
    src = b"".join(streams)
    src_offsets = (ctypes.c_size_t * n)()
    src_lens = (ctypes.c_size_t * n)()
    dst_offsets = (ctypes.c_size_t * n)()
    dst_caps = (ctypes.c_size_t * n)()
    out_lens = (ctypes.c_size_t * n)()
    off = 0
    for i, s in enumerate(streams):
        src_offsets[i] = off
        src_lens[i] = len(s)
        dst_offsets[i] = i * expected_size
        dst_caps[i] = expected_size
        off += len(s)
    dst = ctypes.create_string_buffer(n * expected_size)
    lib.msm_inflate_batch(
        src, src_offsets, src_lens, dst, dst_offsets, dst_caps, out_lens,
        n, n_threads)
    view = memoryview(dst)  # zero-copy; dst.raw would copy the whole buffer
    sentinel = ctypes.c_size_t(-1).value
    out = []
    for i in range(n):
        if out_lens[i] == sentinel:
            out.append(zlib.decompress(streams[i]))  # per-stream fallback
        else:
            start = i * expected_size
            out.append(bytes(view[start: start + out_lens[i]]))
    return out


def inflate_depth_frames(streams: list[bytes],
                         depth_hw: tuple[int, int]) -> np.ndarray:
    """`[n, Hd, Wd]` uint16 depth stack from zlib-ushort frame payloads."""
    expected = depth_hw[0] * depth_hw[1] * 2
    raw = zlib_inflate_batch(streams, expected)
    return np.stack([
        np.frombuffer(r, dtype=np.uint16).reshape(depth_hw) for r in raw])


# Note: this build VM exposes a single CPU core, so the measured batch
# speedup here is ~1x; on production TPU-host VMs (dozens of cores) the
# batched inflate scales with n_threads (pure C, GIL released by ctypes).
