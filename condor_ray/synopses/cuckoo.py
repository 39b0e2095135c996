"""Cuckoo filter (core/.../Sketches/CuckooFilter.java:24-275).

Membership with deletion; 1-byte signed fingerprints ``(byte) hashCode``,
position hash ``abs((a*x + b) % p % numBuckets)`` with p = 1610612741 and
a, b drawn from a seeded Flink XORShiftRandom; at most 500 kicks, then the
``full`` flag disables further cuckooing (update :80-113).  ``merge``
(:192-226) silently returns ``this`` unchanged when either side is full,
params mismatch, or a fingerprint cannot be placed — quirk preserved.

The update path consumes the stateful RNG (nextDouble / nextInt) exactly as
the reference does, so the per-element Python loop is kept; cuckoo filters
are a membership synopsis, not the throughput-critical path.
"""

from __future__ import annotations

import numpy as np

from ..hashing import XORShiftRandom, _to_i32
from .base import Synopsis

_P = 1610612741  # prime, CuckooFilter.java:31


class CuckooFilter(Synopsis):
    mergeable = True
    commutative = True
    MAX_NUM_KICKS = 500

    def __init__(self, bucket_size: int, num_buckets: int, seed: int = 7):
        super().__init__()
        self.bucket_size = int(bucket_size)
        self.num_buckets = int(num_buckets)
        self.seed = int(seed)
        self.buckets: list[list[int]] = [[] for _ in range(self.num_buckets)]
        self.random = XORShiftRandom(seed)
        self.a = self.random.next_int_bound(_P)
        self.b = self.random.next_int_bound(_P)
        self.full = False
        self.elements_processed = 0

    @staticmethod
    def _fingerprint(x: int) -> int:
        # (byte) hashCode — signed 8-bit
        f = x & 0xFF
        return f - 256 if f >= 128 else f

    def _hash(self, x: int) -> int:
        # Java int arithmetic: (a*x + b) % p % numBuckets, abs
        t = _to_i32(_to_i32(self.a * x + self.b))
        # Java % keeps the dividend's sign
        r = t % _P if t >= 0 else -((-t) % _P)
        r = r % self.num_buckets if r >= 0 else -((-r) % self.num_buckets)
        return -r if r < 0 else r

    def update_batch(self, values: np.ndarray, timestamps=None) -> None:
        for x in np.asarray(values, dtype=np.int64).astype(np.int32).tolist():
            self._update_one(x)

    def _update_one(self, x: int) -> None:
        fp = self._fingerprint(x)
        pos1 = self._hash(x)
        bs = self.bucket_size
        buckets = self.buckets
        if self.full or len(buckets[pos1]) < bs:
            buckets[pos1].append(fp)
            self.elements_processed += 1
            return
        pos2 = (pos1 ^ self._hash(fp)) % self.num_buckets
        if len(buckets[pos2]) < bs:
            buckets[pos2].append(fp)
            self.elements_processed += 1
            return
        pos = pos1 if self.random.next_double() < 0.5 else pos2
        for _ in range(self.MAX_NUM_KICKS):
            to_replace = self.random.next_int_bound(bs)
            replaced = buckets[pos][to_replace]
            buckets[pos][to_replace] = fp
            fp = replaced
            pos = (pos ^ self._hash(fp)) % self.num_buckets
            if len(buckets[pos]) < bs:
                buckets[pos].append(fp)
                self.elements_processed += 1
                return
        self.full = True
        buckets[pos1].append(fp)
        self.elements_processed += 1

    def lookup(self, x: int) -> bool:
        fp = self._fingerprint(x)
        pos1 = self._hash(x)
        if fp in self.buckets[pos1]:
            return True
        pos2 = (pos1 ^ self._hash(fp)) % self.num_buckets
        return fp in self.buckets[pos2]

    def lookup_batch(self, values: np.ndarray) -> np.ndarray:
        return np.asarray(
            [self.lookup(x) for x in np.asarray(values, dtype=np.int64).astype(np.int32).tolist()],
            dtype=bool,
        )

    def delete(self, x: int) -> bool:
        fp = self._fingerprint(x)
        pos1 = self._hash(x)
        if fp in self.buckets[pos1]:
            self.buckets[pos1].remove(fp)
            return True
        pos2 = (pos1 ^ self._hash(fp)) % self.num_buckets
        if fp in self.buckets[pos2]:
            self.buckets[pos2].remove(fp)
            return True
        return False

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        # CuckooFilter.java:192-226 — silent no-op on any mismatch/overflow
        if not isinstance(other, CuckooFilter):
            return self
        if (
            self.full
            or other.full
            or other.a != self.a
            or other.b != self.b
            or other.num_buckets != self.num_buckets
            or other.MAX_NUM_KICKS != self.MAX_NUM_KICKS
            or other.bucket_size != self.bucket_size
        ):
            return self
        staged: list[tuple[int, int]] = []
        sizes = [len(b) for b in self.buckets]
        merged = True
        for i in range(self.num_buckets):
            for fp in other.buckets[i]:
                if sizes[i] < self.bucket_size:
                    staged.append((i, fp))
                    sizes[i] += 1
                else:
                    pos2 = (i ^ self._hash(fp)) % self.num_buckets
                    if sizes[pos2] < self.bucket_size:
                        staged.append((pos2, fp))
                        sizes[pos2] += 1
                    else:
                        merged = False
                        break
            if not merged:
                break
        # NOTE: the reference mutates in place and leaves partial inserts behind
        # on failure (merge aborts mid-loop but keeps already-added fingerprints).
        # We reproduce that by applying staged inserts even when merged=False,
        # exactly up to the break point.
        for pos, fp in staged:
            self.buckets[pos].append(fp)
        if merged:
            self.elements_processed += other.elements_processed
        return self

    def _ctor_args(self):
        return (self.bucket_size, self.num_buckets, self.seed)

    def state_dict(self):
        return {
            "buckets": [list(b) for b in self.buckets],
            "a": self.a,
            "b": self.b,
            "full": self.full,
            "elements_processed": self.elements_processed,
            "rng_seed_state": self.random._seed,
        }

    def load_state(self, state):
        self.buckets = [list(b) for b in state["buckets"]]
        self.a = state["a"]
        self.b = state["b"]
        self.full = state["full"]
        self.elements_processed = state["elements_processed"]
        self.random._seed = state["rng_seed_state"]
