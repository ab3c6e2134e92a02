"""ctypes bindings for the native data-layer components:

  batcher.cpp — mmap batch assembler + async prefetcher (libbatcher.so)
  decoder.cpp — libjpeg decode + PIL-parity resize pool (libdecoder.so)

Auto-builds with g++ on first use (single translation units, ~1s each,
cached next to the source); falls back to numpy/PIL implementations when
no compiler or libjpeg is available so the framework stays importable
everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "batcher.cpp")
_SO = os.path.join(_HERE, "libbatcher.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _host_fingerprint() -> str:
    """CPU identity for the -march=native artifact cache: a .so copied to
    a host with different ISA extensions would SIGILL on load/use, which
    silently disables the fallback path — rebuild instead."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _stale(so: str, src: str) -> bool:
    """Rebuild when the .so is missing, older than its source, or built
    on a CPU with a different feature set (-march=native artifact)."""
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        return True
    tag = so + ".buildtag"
    try:
        with open(tag) as f:
            return f.read().strip() != _host_fingerprint()
    except OSError:
        return True


def _write_buildtag(so: str) -> None:
    try:
        with open(so + ".buildtag", "w") as f:
            f.write(_host_fingerprint())
    except OSError:
        pass


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        _write_buildtag(_SO)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale(_SO, _SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.bt_open.restype = ctypes.c_void_p
        lib.bt_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.bt_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.bt_prefetch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        lib.bt_prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64
        ]
        lib.bt_prefetch_get.restype = ctypes.c_int64
        lib.bt_prefetch_get.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.bt_prefetch_get_ref.restype = ctypes.c_void_p
        lib.bt_prefetch_get_ref.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bt_prefetch_release.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.bt_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


_DEC_SRC = os.path.join(_HERE, "decoder.cpp")
_DEC_SO = os.path.join(_HERE, "libdecoder.so")
_dec_lib = None
_dec_tried = False


def _build_decoder() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", _DEC_SO, _DEC_SRC, "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        _write_buildtag(_DEC_SO)
        return True
    except Exception:
        return False


def get_decoder_lib():
    global _dec_lib, _dec_tried
    with _lock:
        if _dec_lib is not None or _dec_tried:
            return _dec_lib
        _dec_tried = True
        if _stale(_DEC_SO, _DEC_SRC):
            if not _build_decoder():
                return None
        try:
            lib = ctypes.CDLL(_DEC_SO)
        except OSError:
            return None
        lib.dec_decode_mem.restype = ctypes.c_int
        lib.dec_decode_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.dec_decode_file.restype = ctypes.c_int
        lib.dec_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.dec_decode_files.restype = ctypes.c_int64
        lib.dec_decode_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _dec_lib = lib
        return _dec_lib


def decode_files(paths, size: int, fast: bool = False, threads: int = 8,
                 out: "np.ndarray | None" = None):
    """Decode+resize JPEG files natively -> (images (n,size,size,3) uint8,
    fail (n,) bool).  Rows with fail=True (non-JPEG, corrupt) are zeroed —
    the caller falls back to PIL for those.  Returns None if the native
    decoder is unavailable.

    `out` (optional, (n,size,size,3) uint8 C-contiguous — e.g. a memmap
    slice of the pack file) receives the rows in place.  Measured: fresh
    np.empty per call first-touch page-faults inside the decode loop and
    costs 5x on a 151 MB batch (213 vs ~1200 img/s); decoding straight
    into the destination avoids both the faults and the extra copy."""
    lib = get_decoder_lib()
    if lib is None:
        return None
    n = len(paths)
    if out is None:
        out = np.empty((n, size, size, 3), dtype=np.uint8)
    else:
        assert out.dtype == np.uint8 and out.shape == (n, size, size, 3)
        assert out.flags["C_CONTIGUOUS"], "out must be C-contiguous"
    failed = np.zeros((n,), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dec_decode_files(
        c_paths, n, size, int(fast),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    return out, failed.astype(bool)


def decode_mem(blob: bytes, size: int, fast: bool = False):
    """Decode one in-memory JPEG -> (size,size,3) uint8, or None on
    failure / native decoder unavailable."""
    lib = get_decoder_lib()
    if lib is None:
        return None
    buf = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty((size, size, 3), dtype=np.uint8)
    rc = lib.dec_decode_mem(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size, size,
        int(fast), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


class NativeBatcher:
    """Multi-threaded gather + async prefetch over a packed uint8 file.

    Usage:
        b = NativeBatcher(path, n, row_shape)
        b.start(batch_size, depth=3, threads=8)
        b.submit(indices)           # one call per upcoming batch
        arr = b.get()               # (batch, *row_shape) uint8, FIFO
    """

    def __init__(self, path: str, n_rows: int, row_shape):
        self.row_shape = tuple(row_shape)
        self.row_bytes = int(np.prod(row_shape))
        self.n_rows = n_rows
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no g++)")
        self._lib = lib
        self._h = lib.bt_open(path.encode(), n_rows, self.row_bytes)
        if not self._h:
            raise OSError(f"bt_open failed for {path}")
        self._batch = 0

    def start(self, batch_size: int, depth: int = 3, threads: int = 8):
        self._batch = batch_size
        self._lib.bt_prefetch_start(self._h, batch_size, depth, threads)

    def submit(self, indices: np.ndarray):
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        self._lib.bt_prefetch_submit(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0],
        )

    def get(self) -> np.ndarray:
        out = np.empty((self._batch, *self.row_shape), dtype=np.uint8)
        n = self._lib.bt_prefetch_get(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        return out[:n]

    def get_view(self):
        """Zero-copy dequeue: (view, token).  `view` aliases the batcher's
        internal buffer — it is valid ONLY until release(token), so consume
        it (device_put / np.copy) before releasing, and release before
        close().  Halves host copy traffic vs get()."""
        data = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_int64()
        token = self._lib.bt_prefetch_get_ref(
            self._h, ctypes.byref(data), ctypes.byref(n)
        )
        arr = np.ctypeslib.as_array(data, shape=(n.value, *self.row_shape))
        return arr, token

    def release(self, token) -> None:
        self._lib.bt_prefetch_release(self._h, token)

    def gather(self, indices: np.ndarray, threads: int = 8) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((idx.shape[0], *self.row_shape), dtype=np.uint8)
        self._lib.bt_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            threads,
        )
        return out

    def close(self):
        if self._h:
            self._lib.bt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
