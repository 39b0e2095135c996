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


# tag -> loaded CDLL or None (failed once -> pure-Python fallback forever)
_libs: dict[str, ctypes.CDLL | None] = {}


def _load_native(tag: str, src_file: str, configure) -> ctypes.CDLL | None:
    """The single loader every kernel shares: NO_NATIVE gate, once-per-process
    attempt cache, compile + dlopen, argtype setup via ``configure(lib)``.
    Any failure caches ``None`` so the fallback decision is made exactly once
    per process (three near-identical copies of this logic drifted before)."""
    if os.environ.get("CONDOR_RAY_NO_NATIVE"):
        return None
    if tag in _libs:
        return _libs[tag]
    try:
        src = os.path.join(os.path.dirname(__file__), src_file)
        lib = ctypes.CDLL(_compile_cached(src, tag))
        configure(lib)
        _libs[tag] = lib
    except Exception:
        _libs[tag] = None
    return _libs[tag]


def _configure_wavelet(lib: ctypes.CDLL) -> None:
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


def load_wavelet_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the wavelet build kernel, or None."""
    return _load_native("wavelet", "wavelet.c", _configure_wavelet)


def _configure_png(lib: ctypes.CDLL) -> None:
    lib.png_unfilter.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
    ]
    lib.png_unfilter.restype = ctypes.c_int


def load_png_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the PNG unfilter kernel, or None."""
    return _load_native("png", "png.c", _configure_png)


def _configure_cm(lib: ctypes.CDLL) -> None:
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


def load_cm_native() -> ctypes.CDLL | None:
    """dlopen (compiling if needed) the fused CM query/update kernel."""
    return _load_native("cmquery", "cmquery.c", _configure_cm)
