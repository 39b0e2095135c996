"""Optional compiled fast paths (plain C, built with the system compiler).

Everything here is best-effort: if no C compiler / headers are available, or
``CONDOR_RAY_NO_NATIVE`` is set, loaders return ``None`` and callers fall
back to the pure-Python implementation.  Compiled artifacts are cached in a
shared directory keyed by source digest, so N Ray workers compile once and
dlopen the same .so (the compile itself is write-to-temp + atomic rename, so
concurrent compilers race benignly).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_wavelet_lib: ctypes.CDLL | None = None
_wavelet_tried = False


def _compile_cached(src_path: str, tag: str) -> str:
    """Compile ``src_path`` into a digest-keyed cached .so; return its path."""
    with open(src_path, "rb") as f:
        code = f.read()
    digest = hashlib.sha256(code).hexdigest()[:16]
    # per-user, 0700: a shared predictable /tmp path would let another
    # local user pre-plant a .so at the digest-keyed name (dlopen'd into
    # every worker) or own the directory and break compilation
    cache_dir = os.environ.get("CONDOR_RAY_NATIVE_CACHE")
    if cache_dir:
        # user-provided dir: respect its existing ownership/permissions
        os.makedirs(cache_dir, exist_ok=True)
    else:
        cache_dir = os.path.join(
            tempfile.gettempdir(), f"condor_ray_native_{os.getuid()}"
        )
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        os.chmod(cache_dir, 0o700)
    so = os.path.join(cache_dir, f"{tag}_{digest}.so")
    if not os.path.exists(so):
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".so.tmp")
        os.close(fd)
        try:
            # plain -O2: SSE2 double arithmetic, no -ffast-math — float ops
            # must match CPython bit-for-bit
            subprocess.run(
                ["cc", "-O2", "-fPIC", "-shared", "-o", tmp, src_path],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return so


def load_wavelet_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the wavelet build kernel, or None."""
    global _wavelet_lib, _wavelet_tried
    if os.environ.get("CONDOR_RAY_NO_NATIVE"):
        return None
    if _wavelet_tried:
        return _wavelet_lib
    _wavelet_tried = True
    try:
        src = os.path.join(os.path.dirname(__file__), "wavelet.c")
        lib = ctypes.CDLL(_compile_cached(src, "wavelet"))
        lib.wv_new.restype = ctypes.c_void_p
        lib.wv_new.argtypes = [ctypes.c_int64]
        lib.wv_free.argtypes = [ctypes.c_void_p]
        lib.wv_free.restype = None
        lib.wv_update.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.wv_update.restype = None
        lib.wv_export_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.wv_export_counts.restype = ctypes.c_int64
        lib.wv_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
        lib.wv_export.restype = ctypes.c_int64
        _wavelet_lib = lib
    except Exception:
        _wavelet_lib = None
    return _wavelet_lib


_png_lib: ctypes.CDLL | None = None
_png_tried = False


def load_png_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the PNG unfilter kernel, or None."""
    global _png_lib, _png_tried
    if os.environ.get("CONDOR_RAY_NO_NATIVE"):
        return None
    if _png_tried:
        return _png_lib
    _png_tried = True
    try:
        src = os.path.join(os.path.dirname(__file__), "png.c")
        lib = ctypes.CDLL(_compile_cached(src, "png"))
        lib.png_unfilter.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,
        ]
        lib.png_unfilter.restype = ctypes.c_int
        _png_lib = lib
    except Exception:
        _png_lib = None
    return _png_lib


_cm_lib: ctypes.CDLL | None = None
_cm_tried = False


def load_cm_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the fused CM query/update kernel."""
    global _cm_lib, _cm_tried
    if os.environ.get("CONDOR_RAY_NO_NATIVE"):
        return None
    if _cm_tried:
        return _cm_lib
    _cm_tried = True
    try:
        src = os.path.join(os.path.dirname(__file__), "cmquery.c")
        lib = ctypes.CDLL(_compile_cached(src, "cmquery"))
        for fn in (lib.cm_query_dense, lib.cm_update_dense):
            fn.restype = None
        lib.cm_query_dense.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.cm_update_dense.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        _cm_lib = lib
    except Exception:
        _cm_lib = None
    return _cm_lib
