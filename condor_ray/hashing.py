"""Hash families with exact Condor/Flink semantics, vectorized with NumPy.

Re-implements, from public sources only:

- ``XORShiftRandom`` — Apache Flink's ``org.apache.flink.util.XORShiftRandom``
  (public Flink source, flink-core): seed scrambling via Flink
  ``MathUtils.murmurHash(int)`` and the 21/35/4 xorshift step.  Used only at
  synopsis construction time, so a scalar Python implementation is fine.
- ``H3HashFunctions`` — Condor's pairwise-independent H3 family
  (reference ``core/.../Sketches/HashFunctions/EfficientH3Functions.java:12-111``):
  32 random int32 per function, hash = XOR of the q-matrix entries gated by the
  input bits, and **negative results are absolute-valued** (``:49-54``).
- ``EH3HashFunction`` — Condor's ±1 generator
  (reference ``core/.../Sketches/HashFunctions/EH3_HashFunction.java:14-75``),
  including its two in-code quirks which we reproduce bit-exactly:
  (a) ``input + (1 << 32)`` is Java *int* arithmetic, so it is really
  ``input + 1`` (wrapped) sign-extended to long, and (b) the inner h-loop
  shifts a constant, so for even rows the 32 XORs cancel (h = bit0) and for
  odd rows h = bit0 | bit1.

All integer arithmetic uses two's-complement int32/int64 wraparound to match
Java.  NumPy wraps silently, matching Java semantics; overflow warnings are
suppressed locally.
"""

from __future__ import annotations

import functools

import numpy as np

_MASK32 = 0xFFFFFFFF
_MASK64 = 0xFFFFFFFFFFFFFFFF

# byte-popcount lookup table for vectorized Long.bitCount
_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _to_i32(x: int) -> int:
    """Wrap a Python int to signed 32-bit (Java int cast)."""
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def _to_i64(x: int) -> int:
    """Wrap a Python int to signed 64-bit (Java long)."""
    x &= _MASK64
    return x - (1 << 64) if x >= (1 << 63) else x


def murmur_hash_int(code: int) -> int:
    """Flink ``MathUtils.murmurHash(int)`` (public Flink source): murmur3-style
    scrambling of a single int, fmix with length 4, result made non-negative
    (MIN_VALUE -> 0)."""
    c = code & _MASK32

    def mul32(a: int, b: int) -> int:
        return (a * b) & _MASK32

    def rotl(v: int, n: int) -> int:
        return ((v << n) | (v >> (32 - n))) & _MASK32

    c = mul32(c, 0xCC9E2D51)
    c = rotl(c, 15)
    c = mul32(c, 0x1B873593)
    c = rotl(c, 13)
    c = (mul32(c, 5) + 0xE6546B64) & _MASK32
    c ^= 4
    # fmix / bitMix
    c ^= c >> 16
    c = mul32(c, 0x85EBCA6B)
    c ^= c >> 13
    c = mul32(c, 0xC2B2AE35)
    c ^= c >> 16
    s = _to_i32(c)
    if s >= 0:
        return s
    if s != -(1 << 31):
        return -s
    return 0


class XORShiftRandom:
    """Flink's XORShiftRandom (public source). Only ``next_int``/``next_long``
    are needed by the synopsis constructors."""

    def __init__(self, seed: int):
        lo = _to_i32(seed)
        hi = _to_i32(_to_i64(seed) >> 32 & _MASK32)
        self._seed = _to_i64(murmur_hash_int(lo) ^ (murmur_hash_int(hi) << 32))

    def _next(self, bits: int) -> int:
        s = self._seed & _MASK64
        s ^= (s << 21) & _MASK64
        s ^= s >> 35
        s ^= (s << 4) & _MASK64
        self._seed = _to_i64(s)
        return _to_i32(s & ((1 << bits) - 1))

    def next_int(self) -> int:
        return self._next(32)

    def next_long(self) -> int:
        # java.util.Random.nextLong(): ((long) next(32) << 32) + next(32)
        hi = self._next(32)
        lo = self._next(32)
        return _to_i64((hi << 32) + lo)

    def next_double(self) -> float:
        # java.util.Random.nextDouble(): (((long) next(26) << 27) + next(27)) * 2^-53
        hi = self._next(26)
        lo = self._next(27)
        return ((hi << 27) + lo) * (2.0**-53)

    def next_int_bound(self, bound: int) -> int:
        # java.util.Random.nextInt(int bound)
        if bound <= 0:
            raise ValueError("bound must be positive")
        r = self._next(31)
        m = bound - 1
        if (bound & m) == 0:  # power of two
            return (bound * r) >> 31
        u = r
        r = u % bound
        while _to_i32(u - r + m) < 0:
            u = self._next(31)
            r = u % bound
        return r


@functools.lru_cache(maxsize=256)
def _h3_tables(num_functions: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(q, lut) for one H3 family — deterministic from (n, seed), immutable."""
    rng = XORShiftRandom(seed)
    q64 = np.empty((num_functions, 32), dtype=np.int64)
    for a in range(num_functions):
        for i in range(32):
            q64[a, i] = rng.next_int()
    q = q64.astype(np.int32)
    # byte-level lookup tables: hash(x) = XOR over the 4 bytes of x of
    # lut[k][byte_k] — 4 gathers instead of 32 bit-masked XOR passes,
    # exactly equivalent to the reference's per-bit loop
    lut = np.zeros((4, 256, num_functions), dtype=np.int32)
    for k in range(4):
        for b in range(256):
            acc = np.zeros(num_functions, dtype=np.int32)
            for j in range(8):
                if (b >> j) & 1:
                    acc ^= q[:, 8 * k + j]
            lut[k, b] = acc
    q.setflags(write=False)
    lut.setflags(write=False)
    return q, lut


class H3HashFunctions:
    """Vectorized H3 family (EfficientH3Functions.java:12-111).

    ``hash_batch(values)`` maps int32 keys -> (n, num_functions) int32 matrix of
    non-negative hash values (abs-valued, Java ``-1 * current``; note
    ``-MIN_VALUE == MIN_VALUE`` wraps exactly as in Java)."""

    def __init__(self, num_functions: int, seed: int):
        self.num_functions = int(num_functions)
        self.seed = int(seed)
        # table build costs ~5 ms; a streaming job constructs one synopsis
        # per (slice, stratum, partition) with the SAME (n, seed), so the
        # tables are process-cached and shared read-only across instances
        self._q, self._lut = _h3_tables(self.num_functions, self.seed)

    def hash_batch(self, values: np.ndarray) -> np.ndarray:
        v = np.ascontiguousarray(values, dtype=np.int32)
        vv = v.view(np.uint32)
        with np.errstate(over="ignore"):
            out = (
                self._lut[0][vv & np.uint32(0xFF)]
                ^ self._lut[1][(vv >> np.uint32(8)) & np.uint32(0xFF)]
                ^ self._lut[2][(vv >> np.uint32(16)) & np.uint32(0xFF)]
                ^ self._lut[3][vv >> np.uint32(24)]
            )
            # Java: if (current < 0) result = -current  (wraps at MIN_VALUE)
            np.negative(out, out=out, where=out < 0)
        return out

    def __eq__(self, other) -> bool:  # reference equality: (numFunctions, seed)
        return (
            isinstance(other, H3HashFunctions)
            and self.num_functions == other.num_functions
            and self.seed == other.seed
        )

    def __hash__(self):
        return hash((self.num_functions, self.seed))


class EH3HashFunction:
    """Vectorized EH3 ±1 generator (EH3_HashFunction.java:14-75), bug-compatible.

    ``rand_batch(values)`` -> (n, height) bool matrix."""

    def __init__(self, seed: int, height: int):
        self.height = int(height)
        self.seed = int(seed)
        rng = XORShiftRandom(seed)
        seeds = np.empty(height, dtype=np.uint64)
        for i in range(height):
            s = rng.next_long() & _MASK64
            seeds[i] = s >> 31  # exactly 33 bits
        self._seeds = seeds

    def rand_batch(self, values: np.ndarray) -> np.ndarray:
        v = np.ascontiguousarray(values, dtype=np.int32)
        with np.errstate(over="ignore"):
            # Java: long longInput = input + (1 << 32)  -- (1<<32) is int 1!
            long_input = (v + np.int32(1)).astype(np.int64)  # sign-extended
        li_u = long_input.view(np.uint64)
        bit0 = (li_u & np.uint64(1)).astype(np.uint8)
        bit1 = ((li_u >> np.uint64(1)) & np.uint64(1)).astype(np.uint8)
        n = v.shape[0]
        out = np.empty((n, self.height), dtype=bool)
        for i in range(self.height):
            masked = li_u & self._seeds[i]
            # Long.bitCount via byte LUT
            parity = (
                _POPCOUNT_LUT[masked.view(np.uint8).reshape(n, 8)].sum(axis=1)
                & np.uint8(1)
            ).astype(np.uint8)
            if i % 2 == 0:
                h = bit0  # 32 XORs of the same bit cancel out
            else:
                h = bit0 | bit1
            out[:, i] = (parity ^ h) == 1
        return out


def java_string_hash(s: str) -> int:
    """``java.lang.String.hashCode()``: s[0]*31^(n-1) + ... over UTF-16 units."""
    h = 0
    b = s.encode("utf-16-be")
    for k in range(0, len(b), 2):
        unit = (b[k] << 8) | b[k + 1]
        h = (31 * h + unit) & _MASK32
    return _to_i32(h)


def java_string_hash_array(strings, cache: dict | None = None) -> np.ndarray:
    """Vectorize java_string_hash over an iterable of strings via a unique-value
    cache (conv_ids / tool names repeat heavily)."""
    cache = cache if cache is not None else {}
    out = np.empty(len(strings), dtype=np.int32)
    for i, s in enumerate(strings):
        h = cache.get(s)
        if h is None:
            h = java_string_hash(s) if s is not None else 0
            cache[s] = h
        out[i] = h
    return out


def java_mod(a: np.ndarray, m: int) -> np.ndarray:
    """Java ``%`` (truncated remainder) for int arrays; result sign follows the
    dividend.  Inputs here are non-negative except int32 MIN_VALUE (where the
    reference would throw ArrayIndexOutOfBounds); we floor-mod that one case."""
    r = np.remainder(a, m)  # floor mod == Java mod for non-negative a
    return r


def java_string_hash_arrow(arr) -> np.ndarray:
    """Vectorized ``String.hashCode`` over a pyarrow StringArray.

    ASCII strings (the common case: conv ids, tool names) are hashed by a
    length-grouped polynomial over the raw UTF-8 buffer — no per-row Python.
    Rows containing non-ASCII bytes fall back to ``java_string_hash`` (UTF-16
    semantics).  Nulls hash to 0.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        lut = _java_hash_string_array(arr.dictionary)
        idx = arr.indices.to_numpy(zero_copy_only=False)
        null_mask = np.isnan(idx) if idx.dtype.kind == "f" else (idx < 0)
        idx = np.where(null_mask, 0, idx)
        out = lut[idx.astype(np.int64)]
        out[null_mask] = 0  # nulls hash to 0 on every path
        return out
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if len(arr) > 1024:
        # hash only the distinct values (conv ids / tools repeat heavily)
        return java_string_hash_arrow(arr.dictionary_encode())
    return _java_hash_string_array(arr)


def _java_hash_string_array(arr) -> np.ndarray:
    import pyarrow as pa

    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    out = np.zeros(len(arr), dtype=np.int64)
    with np.errstate(over="ignore"):
        for L in np.unique(lengths):
            if L == 0:
                continue
            rows = np.flatnonzero(lengths == L)
            idx = offsets[rows][:, None] + np.arange(L)
            b = data[idx].astype(np.int64)
            non_ascii = (b >= 128).any(axis=1)
            # 31^k mod 2^32 powers
            pw = np.empty(L, dtype=np.int64)
            p = 1
            for k in range(L - 1, -1, -1):
                pw[k] = p
                p = (p * 31) & _MASK32
            h = (b * pw[None, :]).sum(axis=1) & _MASK32
            out[rows] = h
            if non_ascii.any():
                for r in rows[non_ascii]:
                    out[r] = java_string_hash(arr[int(r)].as_py()) & _MASK32
    out &= _MASK32
    return np.where(out >= 1 << 31, out - (1 << 32), out).astype(np.int32)


def string_bucket_of(col, n_buckets: int) -> np.ndarray:
    """Per-row partition ids for a string column: dictionary-encode, Java-hash
    the distinct values, golden-ratio mix, ``% n_buckets`` — the engine's ONE
    conv/key routing rule.  State-store co-location across stages depends on
    every site mixing identically, so route through here, never a local copy.
    Returns int64 ids (callers cast for storage)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dic = col.dictionary_encode() if not pa.types.is_dictionary(col.type) else col
    h = java_string_hash_arrow(dic.dictionary).astype(np.int64)
    lut = ((h * 0x9E3779B9) >> 16) % n_buckets
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return lut[codes]


def int_bucket_of(u: np.ndarray, n_buckets: int) -> np.ndarray:
    """Golden-ratio bucket ids for an int64 key array — the int-key twin of
    ``string_bucket_of`` (events user_id routing, int distinct-count keys)."""
    return (((u.astype(np.int64) * 0x9E3779B9) >> 16) % n_buckets).astype(np.int64)
