"""DDSketch relative-error quantiles (core/.../Sketches/DDSketch.java:27-392).

Bin index (:122-131): ``i = log(v)/logGamma`` truncated toward zero, minus 1
when negative (NOT a plain floor — differs for exact negative integers);
collapse (:108-116): when bins > maxNumBins, pop the lowest bin and fold its
count into the new lowest.  Quirks preserved:
- ``invert`` zeroes ``globalCount`` (dead accumulation loop commented out in
  the reference, DDSketch.java:256-282) and drops non-positive bins;
- quantile walk (:198-239): rank = (long)(q*(count-1)); ascending scan for
  q <= 0.5 starting at zeroCount, descending otherwise.

Documented deviation: the reference collapses after EVERY row; our vectorized
``update_batch`` bins a whole batch then collapses, which can differ when a
batch both overflows maxNumBins and later adds lower bins.  Error guarantees
for middle/high quantiles are unaffected.
"""

from __future__ import annotations

import math

import numpy as np

from .base import Synopsis

_DOUBLE_MIN_NORMAL = 2.2250738585072014e-308
_DOUBLE_MAX = 1.7976931348623157e308


class DDSketch(Synopsis):
    mergeable = True
    invertible = True
    commutative = True

    def __init__(self, relative_accuracy: float, max_num_bins: int):
        super().__init__()
        if not (0 < relative_accuracy < 1):
            raise ValueError("The relative accuracy must be between 0 and 1.")
        self.relative_accuracy = float(relative_accuracy)
        self.max_num_bins = int(max_num_bins)
        self.log_gamma = math.log((1 + relative_accuracy) / (1 - relative_accuracy))
        self.is_collapsed = False
        self.min_indexed_value = max(
            0.0,
            max(
                math.exp((-(2**31) + 1) * self.log_gamma),
                _DOUBLE_MIN_NORMAL * math.exp(self.log_gamma),
            ),
        )
        self.max_indexed_value = min(
            math.exp((2**31 - 1) * self.log_gamma) if self.log_gamma * (2**31 - 1) < 709 else math.inf,
            _DOUBLE_MAX / (1 + relative_accuracy),
        )
        self.zero_count = 0
        self.global_count = 0
        self.counts: dict[int, int] = {}

    # -- indexing ---------------------------------------------------------
    def _index_batch(self, v: np.ndarray) -> np.ndarray:
        idx = np.log(v) / self.log_gamma
        t = np.trunc(idx)
        return np.where(idx >= 0, t, t - 1).astype(np.int64)

    def value(self, index: int) -> float:
        return math.exp(index * self.log_gamma) * (1 + self.relative_accuracy)

    def _collapse(self) -> None:
        excess = len(self.counts) - self.max_num_bins
        if excess <= 0:
            return
        # one sort + fold of the lowest `excess` bins into the next one —
        # equivalent to the reference's repeated pollFirstEntry->merge
        # (DDSketch.java:335-339) without re-sorting per evicted bin
        keys = sorted(self.counts)
        folded = 0
        for k in keys[:excess]:
            folded += self.counts.pop(k)
        self.counts[keys[excess]] += folded
        self.is_collapsed = True

    # -- updates ----------------------------------------------------------
    def update_batch(self, values: np.ndarray, timestamps=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if (v < 0).any() or (v > self.max_indexed_value).any():
            raise ValueError(
                "The input value is outside the range that is tracked by the sketch."
            )
        small = v < self.min_indexed_value
        self.zero_count += int(small.sum())
        v = v[~small]
        if len(v) == 0:
            return
        self.global_count += len(v)
        idx = self._index_batch(v)
        uniq, cnt = np.unique(idx, return_counts=True)
        for k, c in zip(uniq.tolist(), cnt.tolist()):
            self.counts[k] = self.counts.get(k, 0) + c
        self._collapse()

    def decrement_batch(self, values: np.ndarray) -> None:
        """Row-wise semantics of DDSketch.java:294-314 in one vectorized
        pass: the first ``zero_count`` sub-min rows decrement zero_count;
        every other row decrements global_count (floored at 0) and its bin
        (bins reaching 0 are removed; absent bins are a no-op — sub-min
        rows index below every stored bin, matching the reference)."""
        v = np.asarray(values, dtype=np.float64)
        if (v < 0).any() or (v > self.max_indexed_value).any():
            raise ValueError(
                "The input value is outside the range that is tracked by the sketch."
            )
        small = v < self.min_indexed_value
        k = min(self.zero_count, int(small.sum()))
        self.zero_count -= k
        if k:
            else_mask = np.ones(len(v), dtype=bool)
            else_mask[np.flatnonzero(small)[:k]] = False
            ev = v[else_mask]
        else:
            ev = v
        if not len(ev):
            return
        self.global_count = max(0, self.global_count - len(ev))
        # sub-min survivors index below min_indexed_value's bin — never
        # present in counts (the reference's bins.get(...) == null no-op)
        idx = self._index_batch(np.maximum(ev, 5e-324))
        uniq, cnt = np.unique(idx, return_counts=True)
        for i, c in zip(uniq.tolist(), cnt.tolist()):
            b = self.counts.get(i)
            if b is None:
                continue
            if b - c <= 0:
                del self.counts[i]
            else:
                self.counts[i] = b - c

    # -- merge / invert ---------------------------------------------------
    def _check(self, other: "DDSketch"):
        if not (
            isinstance(other, DDSketch)
            and self.relative_accuracy == other.relative_accuracy
            and self.max_num_bins == other.max_num_bins
        ):
            raise ValueError("DDSketches to merge must share accuracy and maxNumBins")

    def merge(self, other: "DDSketch") -> "DDSketch":
        self._check(other)
        if not other.counts:
            # reference quirk (DDSketch.java:329-331): an other with only
            # zero/sub-min values (counts empty, zeroCount > 0) is SKIPPED
            # entirely — its zero_count/global_count are dropped
            return self
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + c
        self._collapse()
        self.global_count += other.global_count
        self.zero_count += other.zero_count
        return self

    def invert(self, other: "DDSketch") -> "DDSketch":
        self._check(other)
        if not other.counts:
            # reference quirk (DDSketch.java:250-252): same empty-counts
            # early return as merge — a zeros-only retraction is skipped
            return self
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) - c
        self.counts = {k: c for k, c in sorted(self.counts.items()) if c > 0}
        self.global_count = 0  # reference quirk (DDSketch.java:256-282)
        if self.zero_count > other.zero_count:
            self.zero_count -= other.zero_count
        else:
            self.zero_count = 0
        return self

    # -- queries ----------------------------------------------------------
    def get_min_value(self) -> float:
        if self.zero_count > 0:
            return 0.0
        return self.value(min(self.counts))

    def get_max_value(self) -> float:
        if self.zero_count > 0 and not self.counts:
            return 0.0
        return self.value(max(self.counts))

    def get_value_at_quantile(self, quantile: float) -> float:
        count = self.zero_count + self.global_count
        if not (0 <= quantile <= 1):
            raise ValueError("The quantile must be between 0 and 1.")
        if count == 0:
            raise LookupError("empty sketch")
        rank = int(quantile * (count - 1))
        if rank < self.zero_count:
            return 0.0
        items = sorted(self.counts.items())
        if quantile <= 0.5:
            n = self.zero_count
            for key, c in items:
                n += c
                if n > rank:
                    return self.value(key)
            return self.get_max_value()
        else:
            n = count
            for key, c in reversed(items):
                n -= c
                if n <= rank:
                    return self.value(key)
            return self.get_min_value()

    def _ctor_args(self):
        return (self.relative_accuracy, self.max_num_bins)

    def state_dict(self):
        keys = np.fromiter(self.counts.keys(), dtype=np.int64, count=len(self.counts))
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=len(self.counts))
        return {
            "keys": keys,
            "vals": vals,
            "zero_count": self.zero_count,
            "global_count": self.global_count,
            "is_collapsed": self.is_collapsed,
        }

    def load_state(self, state):
        self.counts = dict(zip(state["keys"].tolist(), state["vals"].tolist()))
        self.zero_count = state["zero_count"]
        self.global_count = state["global_count"]
        self.is_collapsed = state["is_collapsed"]
