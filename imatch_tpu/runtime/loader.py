"""Python binding for the native decode pool (runtime/native/loader.cc).

Builds the shared library on first use with g++ (cached next to the
source; rebuilt when the source changes) and exposes:

- ``NativeImageLoader`` — submit bytes/paths, collect decoded RGB numpy
  arrays; decode runs on a C++ worker pool off the GIL.
- ``decode_image_bytes`` / ``decode_batch`` — convenience wrappers with
  transparent PIL fallback for formats the native path doesn't cover
  (AVIF) or when no C++ toolchain exists.

This is the host half of the ingest pipeline (SURVEY.md §7 "host/device
pipeline"): the TPU side consumes the uint8 batches it produces.
"""

from __future__ import annotations

import ctypes
import hashlib
import io
import logging
import os
import subprocess
import sys
import threading
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger("imatch.loader")

_SRC = os.path.join(os.path.dirname(__file__), "native", "loader.cc")


def _jpeg_link_args():
    """Prefer Pillow's bundled libjpeg-turbo (SIMD, ~3-4x the system
    libjpeg62) — same v62 ABI as the system header we compile against."""
    try:
        import glob
        import PIL

        libs_dir = os.path.join(
            os.path.dirname(os.path.dirname(PIL.__file__)), "pillow.libs"
        )
        cands = sorted(glob.glob(os.path.join(libs_dir, "libjpeg-*.so.62*")))
        if cands:
            so = os.path.basename(cands[-1])
            return [f"-L{libs_dir}", f"-l:{so}", f"-Wl,-rpath,{libs_dir}"]
    except Exception:
        pass
    return ["-ljpeg"]


_LIBS = _jpeg_link_args() + ["-lpng", "-lwebp"]

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen the native loader."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(
                os.path.dirname(_SRC), f"libimatch_loader_{digest}.so"
            )
            if not os.path.exists(so_path):
                # compile to a private temp name and os.replace into
                # place: concurrent processes racing this path must
                # never dlopen a half-linked ELF (which would silently
                # disable the native loader for their whole lifetime)
                tmp_path = f"{so_path}.tmp.{os.getpid()}"
                cmd = [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", tmp_path, _SRC, *_LIBS, "-lpthread",
                ]
                logger.info("building native loader: %s", " ".join(cmd))
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                    os.replace(tmp_path, so_path)
                finally:
                    if os.path.exists(tmp_path):
                        os.unlink(tmp_path)
            lib = ctypes.CDLL(so_path)
            lib.iml_create.restype = ctypes.c_void_p
            lib.iml_create.argtypes = [ctypes.c_int]
            lib.iml_destroy.argtypes = [ctypes.c_void_p]
            lib.iml_submit_mem.restype = ctypes.c_longlong
            lib.iml_submit_mem.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
            ]
            lib.iml_submit_file.restype = ctypes.c_longlong
            lib.iml_submit_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.iml_wait.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.iml_wait.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.iml_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
            lib.iml_decode_probe.restype = ctypes.c_int
            lib.iml_decode_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception as e:  # no toolchain / headers -> PIL fallback
            logger.warning("native loader unavailable (%s); using PIL", e)
            _lib_failed = True
        return _lib


def _pil_decode(data: bytes) -> np.ndarray:
    from PIL import Image

    try:  # AVIF support, as the reference imports it (main.py:29-33)
        import pillow_avif  # noqa: F401
    except ImportError:
        pass
    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"))


class NativeImageLoader:
    """Ticketed async decode pool; falls back to sync PIL without g++."""

    def __init__(self, threads: Optional[int] = None):
        self.threads = threads or min(8, os.cpu_count() or 1)
        self._lib = _build_lib()
        self._pool = (
            self._lib.iml_create(self.threads) if self._lib else None
        )
        self._closed = False
        self._state_lock = threading.Lock()
        self._inflight = 0  # threads inside a native submit/wait call

    @property
    def native(self) -> bool:
        return self._pool is not None

    def close(self):
        """Idempotent; never destroys the pool under a thread that is
        inside a native call (a request still decoding at shutdown
        would otherwise hit freed memory). Skipping destroy in that
        case leaks the pool — acceptable, since close() runs at
        process exit."""
        with self._state_lock:
            if self._pool is None or self._closed:
                return
            if self._inflight:
                logger.warning(
                    "native loader closed with %d in-flight decodes; "
                    "leaving the pool to the OS", self._inflight
                )
                self._closed = True
                return
            self._lib.iml_destroy(self._pool)
            self._closed = True

    def _enter_native(self) -> bool:
        with self._state_lock:
            if self._pool is None or self._closed:
                return False
            self._inflight += 1
            return True

    def _exit_native(self):
        with self._state_lock:
            self._inflight -= 1

    def __del__(self):
        if sys is None or sys.is_finalizing():
            return  # ctypes calls during interpreter teardown can crash
        try:
            self.close()
        except Exception:
            pass

    # -- ticketed interface ------------------------------------------------

    def submit_bytes(self, data: bytes):
        if isinstance(data, bytearray):
            # the native path hands data to a c_char_p argument, which
            # ctypes rejects for bytearray (ArgumentError) — while the
            # PIL fallback accepts it, so the bug would only appear on
            # hosts with the compiled pool
            data = bytes(data)
        if not self._enter_native():
            return ("pil", data)
        try:
            t = self._lib.iml_submit_mem(self._pool, data, len(data))
        finally:
            self._exit_native()
        return ("native", t, data)  # keep data for the PIL fallback path

    def submit_path(self, path: str):
        if not self._enter_native():
            with open(path, "rb") as f:
                return ("pil", f.read())
        try:
            t = self._lib.iml_submit_file(self._pool, path.encode())
        finally:
            self._exit_native()
        return ("native", t, path)

    def wait(self, ticket) -> np.ndarray:
        if ticket[0] == "pil":
            return _pil_decode(ticket[1])
        _, t, src = ticket
        w = ctypes.c_int()
        h = ctypes.c_int()
        err = ctypes.c_int()
        if not self._enter_native():
            data = src if isinstance(src, bytes) else open(src, "rb").read()
            return _pil_decode(data)
        try:
            ptr = self._lib.iml_wait(
                self._pool, t, ctypes.byref(w), ctypes.byref(h),
                ctypes.byref(err),
            )
        finally:
            self._exit_native()
        if not ptr:
            # unsupported format (AVIF) or decode failure -> PIL
            data = src if isinstance(src, bytes) else open(src, "rb").read()
            return _pil_decode(data)
        # Zero-copy: numpy views the malloc'd buffer; a weakref finalizer
        # frees it when the array (and its views) die.
        import weakref

        n = w.value * h.value * 3
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(
            h.value, w.value, 3
        )
        weakref.finalize(arr.base, self._lib.iml_free, ptr)
        return arr

    # -- batch convenience ---------------------------------------------------

    def decode_batch(
        self, items: Sequence, on_error: str = "none"
    ) -> List[Optional[np.ndarray]]:
        """bytes or paths -> RGB arrays, decoded concurrently.

        EVERY ticket is drained even when some fail — abandoning tickets
        after the first exception would leak their decoded C buffers in
        the pool's results map for the process lifetime. Failures become
        None entries (on_error="none", per-file isolation for bulk
        ingest) or re-raise after the drain (on_error="raise")."""
        tickets: List = []
        first_exc: Optional[Exception] = None
        for x in items:
            # submit failures must not abandon already-submitted
            # tickets (the old comprehension form did exactly that,
            # leaking their decoded C buffers in the pool's results
            # map): record a None ticket and keep going so the drain
            # below still reaps every successful submission
            try:
                tickets.append(
                    self.submit_bytes(x)
                    if isinstance(x, (bytes, bytearray))
                    else self.submit_path(x)
                )
            except Exception as e:
                logger.warning("decode submit failed: %s", e)
                tickets.append(None)
                if first_exc is None:
                    first_exc = e
        out: List[Optional[np.ndarray]] = []
        for t in tickets:
            try:
                out.append(None if t is None else self.wait(t))
            except Exception as e:
                logger.warning("decode failed: %s", e)
                out.append(None)
                if first_exc is None:
                    first_exc = e
        if on_error == "raise" and first_exc is not None:
            raise first_exc
        return out


_default_loader: Optional[NativeImageLoader] = None
_default_lock = threading.Lock()


def default_loader() -> NativeImageLoader:
    global _default_loader
    with _default_lock:
        if _default_loader is None:
            import atexit

            _default_loader = NativeImageLoader()
            # Join the C++ workers before interpreter teardown — a GC-time
            # __del__ during shutdown can race Python finalization.
            atexit.register(_default_loader.close)
        return _default_loader


def decode_image_bytes(data: bytes) -> np.ndarray:
    return default_loader().decode_batch([data], on_error="raise")[0]


def probe_image_bytes(data: bytes):
    """Header-only (w, h) probe via the native pool's codecs; None when
    unavailable or the format needs the PIL path (AVIF)."""
    lib = _build_lib()
    if lib is None or not hasattr(lib, "iml_decode_probe"):
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.iml_decode_probe(data, len(data), ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if rc == 0 else None
