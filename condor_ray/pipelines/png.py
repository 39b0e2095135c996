"""Pure-stdlib PNG codec (zlib inflate + scanline unfilter).

The container ships no image libraries, but PNG's baseline path needs only
``zlib`` + numpy: IDAT is a zlib stream of filtered scanlines, and the five
scanline filters (None/Sub/Up/Average/Paeth) invert with byte arithmetic.
This makes ``ImageDecoder``'s real-decode branch REAL — an actual
compressed image format decoded end-to-end — instead of a
``pragma: no cover`` Pillow probe.

Scope (documented, checked, and erred on violation): 8-bit depth, color
types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.  That
covers what any sane data pipeline emits; exotic PNGs (palette, 16-bit,
Adam7) raise ``NotImplementedError`` so they surface instead of decoding
wrong.

Performance: the unfilter runs as ONE C pass over the whole image via the
``_native/png.c`` ctypes kernel (same compile-once-per-host plumbing as
``_native/wavelet.c``), because Sub/Average/Paeth filters carry a
horizontal byte-to-byte data dependency numpy cannot vectorize.  When no C
compiler is available (or ``CONDOR_RAY_NO_NATIVE`` is set) the pure-numpy
fallback runs: None/Sub/Up rows vectorized (Sub via a wrapping per-channel
cumsum), Average/Paeth rows in a per-pixel loop.  A real deployment may
still swap in Pillow through the same ``ImageDecoder.__init__`` slot.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if not is_png(payload):
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder "
            f"(bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); install Pillow for full coverage"
        )
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    rows = raw.reshape(height, stride + 1)
    filters = rows[:, 0]
    if (filters > 4).any():
        raise ValueError(f"bad PNG filter byte {int(filters.max())}")

    from .._native import load_png_native

    lib = load_png_native()
    if lib is not None:
        # one C pass over the whole image (Sub/Average/Paeth rows carry a
        # horizontal data dependency numpy can't vectorize)
        filt_c = np.ascontiguousarray(filters)
        # explicit copy, not ascontiguousarray: a 1-row image's slice is
        # already contiguous and would come back as a read-only view over
        # the decompressed bytes — the C kernel unfilters in place
        scan_c = rows[:, 1:].copy()
        rc = lib.png_unfilter(
            filt_c.ctypes.data, scan_c.ctypes.data, height, stride, ch
        )
        if rc != 0:
            raise ValueError("bad PNG filter byte")
        return scan_c.reshape(height, width, ch)

    scan = rows[:, 1:].astype(np.int64)  # room for wrapping arithmetic
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = filters[y]
        cur = scan[y]
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: wrapping per-channel cumsum
            rec = cur.copy()
            for c in range(ch):
                rec[c::ch] = np.cumsum(cur[c::ch])
            rec &= 0xFF
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average (horizontal dependency -> pixel loop)
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec
        prev = rec.astype(np.int64)
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, row_filters=None) -> bytes:
    """(h, w) or (h, w, ch) uint8 -> PNG bytes.

    ``row_filters``: per-row filter ids (0-4) to APPLY before compression —
    defaults to all-0; non-trivial values exist so tests can exercise every
    unfilter path against this encoder."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    flat = arr.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    if row_filters is None:
        row_filters = np.zeros(h, dtype=np.int64)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(row_filters[y])
        rec = flat[y]
        left = np.concatenate([np.zeros(ch, np.int64), rec[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if f == 0:
            filt = rec
        elif f == 1:
            filt = rec - left
        elif f == 2:
            filt = rec - prev
        elif f == 3:
            filt = rec - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = rec - pred
        else:
            raise ValueError(f"bad filter id {f}")
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = rec
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
