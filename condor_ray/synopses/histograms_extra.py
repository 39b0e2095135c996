"""Secondary histogram kernels completing SURVEY §2.1 supporting rows:

- ``EquiDepthHistBuilder`` — equi-depth from sorted (value -> frequency) input
  (core/.../Histograms/EquiDepthHistBuilder.java:10-49, ported exactly).
- ``RealValuedBucket4LT`` — 4-level-tree bucket compressed into 32 bits
  (core/.../Histograms/RealValuedBucket4LT.java:7-250): build packs level
  deltas into 6/5/5/4/4/4/4-bit fields; getFrequency reconstructs counts
  recursively.  Java division by a zero count yields NaN and
  ``Math.round(NaN) == 0`` — reproduced.
- ``EquiWidthHistogram4LT`` — equi-width histogram over 4LT buckets
  (core/.../Histograms/EquiWidthHistogram4LT.java:9-82).  Its ``merge``
  returns ``None`` in the reference (:66-73) — quirk preserved.
- ``SplitAndMergeWithDDSketch`` — maintained equi-depth histogram with a
  DDSketch quantile oracle (core/.../Histograms/SplitAndMergeWithDDSketch.java
  :34-330).  Preserved quirks: ``merge`` does NOT sum totalFrequencies before
  the recompute (:274-290), and after a sketch-based recompute the split
  threshold becomes ``round(total * (2 + gamma))`` (:124), effectively
  freezing further splits.
"""

from __future__ import annotations

import math

import numpy as np

from .base import Synopsis
from .ddsketch import DDSketch
from .histograms import EquiDepthHistogram, EquiWidthHistogram, _SortedMap


class EquiDepthHistBuilder:
    def build(self, sorted_input: dict[int, int], num_buckets: int, total: int) -> EquiDepthHistogram:
        keys = sorted(sorted_input)
        n_buckets = min(num_buckets, len(keys))
        left = np.zeros(n_buckets, dtype=np.float64)
        bucket_size = total / n_buckets
        left[0] = keys[0]
        rightmost = keys[-1]
        temp = 0.0
        index = 1
        i = 0
        while i < len(keys):
            prev = keys[i]
            temp += sorted_input[keys[i]]
            i += 1
            current_left = rightmost if i >= len(keys) else keys[i]
            while temp >= bucket_size and index < n_buckets:
                temp -= bucket_size
                fraction = min(temp / bucket_size, 1.0)
                left[index] = prev + (1 - fraction) * (current_left - prev)
                index += 1
        return EquiDepthHistogram(left, rightmost, total)


def _jround(x: float) -> int:
    """Java Math.round on double (NaN -> 0, floor(x + 0.5))."""
    if math.isnan(x):
        return 0
    return math.floor(x + 0.5)


class RealValuedBucket4LT:
    def __init__(self, lower_bound: float, upper_bound: float):
        if upper_bound < lower_bound:
            raise ValueError("upperBound must be greater than lowerBound!")
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.root = 0
        self.lower_levels = 0

    def build(self, frequencies) -> None:
        f = list(frequencies)
        if len(f) != 8:
            raise ValueError("frequency array has to be of length 8!")
        c3_1 = f[0] + f[1]
        c3_3 = f[4] + f[5]
        c2_1 = c3_1 + f[2] + f[3]
        self.root = c2_1 + c3_3 + f[6] + f[7]

        def frac(a, b):
            return a / b if b else float("nan")

        ll = _jround(frac(c2_1, self.root) * 63) << 26
        ll += _jround(frac(c3_1, c2_1) * 31) << 21
        ll += _jround(frac(c3_3, self.root - c2_1) * 31) << 16
        ll += _jround(frac(f[0], c3_1) * 15) << 12
        ll += _jround(frac(f[2], c2_1 - c3_1) * 15) << 8
        ll += _jround(frac(f[4], c3_3) * 15) << 4
        ll += _jround(frac(f[6], self.root - c2_1 - c3_3) * 15)
        self.lower_levels = ll

    def _counts(self):
        ll = self.lower_levels
        d2_1 = ll >> 26
        l2 = [_jround(d2_1 / 64 * self.root)]
        l2.append(self.root - l2[0])
        d3_1 = (ll >> 21) & 31
        d3_3 = (ll >> 16) & 31
        l3 = [_jround(d3_1 / 32 * l2[0])]
        l3.append(l2[0] - l3[0])
        l3.append(_jround(d3_3 / 32 * l2[1]))
        l3.append(l2[1] - l3[2])
        d4 = [(ll >> 12) & 15, (ll >> 8) & 15, (ll >> 4) & 15, ll & 15]
        l4 = []
        for i in range(4):
            a = _jround(d4[i] / 16 * l3[i])
            l4.extend([a, l3[i] - a])
        return l2, l3, l4

    def get_frequency(self, q_lo: float, q_hi: float) -> int:
        # RealValuedBucket4LT.java:84-172, ported exactly (incl. int casts).
        # quirk: on fractional-width grids (domain span not divisible by the
        # 8-per-bucket grid) the `int(ceil(...)) + lower_bound` sub-bucket
        # boundaries can push new_lo past q_hi, and the recursive call then
        # trips the guard below — the reference throws
        # IllegalArgumentException on the identical inputs
        # (RealValuedBucket4LT.java:84-85 via :131/:162).  Preserved and
        # pinned by test_histograms_extra_quirks.
        if q_hi < q_lo:
            raise ValueError("upper Bound cannot be smaller than lower Bound!")
        if q_lo <= self.lower_bound and q_hi >= self.upper_bound:
            return self.root
        if q_lo == q_hi or q_lo > self.upper_bound or q_hi < self.lower_bound:
            return 0
        frequency = 0
        span = self.upper_bound - self.lower_bound
        distance = span / 8.0
        new_lo, new_hi = q_lo, q_hi
        left = max((q_lo - self.lower_bound) * 8 / span, 0.0)
        right = min((q_hi - self.lower_bound) * 8 / span, 8.0)
        l2, l3, l4 = self._counts()
        if left == 0 and right >= 4:
            frequency += l2[0]
            frequency += self.get_frequency(int(math.ceil(distance * 4)) + self.lower_bound, q_hi)
        elif left <= 4 and right == 8:
            frequency += l2[1]
            frequency += self.get_frequency(q_lo, int(math.floor(distance * 4)) + self.lower_bound)
        else:
            if (math.floor(right) - math.ceil(left)) >= 3 or (
                (math.floor(right) - math.ceil(left)) >= 2 and math.floor(right) % 2 == 0
            ):
                for i in range(4):
                    if left <= i * 2 and right >= i * 2 + 2:
                        frequency += l3[i]
                        new_lo = max(new_lo, int(math.ceil(distance * (i * 2 + 2))) + self.lower_bound)
                        new_hi = min(new_hi, int(math.floor(distance * (i * 2))) + self.lower_bound)
                frequency += self.get_frequency(q_lo, new_hi)
                frequency += self.get_frequency(new_lo, q_hi)
            else:
                if (math.floor(right) - math.ceil(left)) >= 1:
                    for i in range(8):
                        if left <= i and right >= i + 1:
                            frequency += l4[i]
                            # quirk: ceil wraps (distance*(i+1) + lowerBound)
                            # HERE but only distance*k in the l3 twin — exact
                            # transcription of the reference's own
                            # inconsistency (RealValuedBucket4LT.java:162 vs
                            # :131); they differ for fractional lower bounds
                            new_lo = max(new_lo, int(math.ceil(distance * (i + 1) + self.lower_bound)))
                            new_hi = min(new_hi, int(math.floor(distance * i)) + self.lower_bound)
                    frequency += self.get_frequency(q_lo, new_hi)
                    frequency += self.get_frequency(new_lo, q_hi)
                else:
                    bucket_index = int(math.floor(left))
                    frequency += int((right - left) * l4[bucket_index])
        return frequency

    def merge(self, other: "RealValuedBucket4LT"):
        # reference merge body is unreachable scaffolding; parity via
        # EquiWidthHistogram4LT.merge returning None (quirk)
        return None


class EquiWidthHistogram4LT:
    def __init__(self, old: EquiWidthHistogram):
        self.lower_bound = old.lower_bound
        self.upper_bound = old.upper_bound
        old_n = old.num_buckets
        old_len = (self.upper_bound - self.lower_bound) / old_n
        self.bucket_length = old_len * 8
        self.num_buckets = int(math.ceil(old_n / 8.0))
        # reference quirk (EquiWidthHistogram4LT.java:24-25): the pad is
        # old_n % 8, NOT (8 - old_n % 8) % 8, so the reported upper_bound can
        # land INSIDE the last 8-wide bucket (e.g. 10 buckets -> bound +2
        # while the grid spans +6).  Kept bit-exact.
        extra = old_n % 8
        self.upper_bound += extra * old_len
        # Java Arrays.copyOfRange zero-pads reads past the end; pad to the
        # full 8-per-bucket grid
        freqs = np.concatenate(
            [old.frequency,
             np.zeros(self.num_buckets * 8 - old_n, dtype=old.frequency.dtype)]
        )
        self.buckets = []
        for i in range(self.num_buckets):
            b = RealValuedBucket4LT(
                self.lower_bound + self.bucket_length * i,
                self.lower_bound + self.bucket_length * (i + 1),
            )
            b.build(freqs[i * 8 : i * 8 + 8].tolist())
            self.buckets.append(b)

    def range_query(self, lower: float, upper: float) -> int:
        # quirk: the LAST 4LT bucket is never queried — the reference clamps
        # rightIndex to numBuckets-1 and then loops `i < rightIndex`
        # EXCLUSIVE (EquiWidthHistogram4LT.java:39-42), so any range reaching
        # the domain end under-counts by the last bucket's overlap (e.g. a
        # full-domain query returns only the first numBuckets-1 buckets).
        # Ported bit-exact; pinned by test_histograms_extra_quirks.
        result = 0
        left = max(int((lower - self.lower_bound) / self.bucket_length), 0)
        right = min(
            self.num_buckets - 1,
            int(math.ceil((upper - self.lower_bound) / self.bucket_length)),
        )
        for i in range(left, right):
            result += self.buckets[i].get_frequency(lower, upper)
        return result

    def merge(self, other: "EquiWidthHistogram4LT"):
        if (
            other.lower_bound != self.lower_bound
            or other.upper_bound != self.upper_bound
            or other.num_buckets != self.num_buckets
        ):
            raise ValueError("Histograms need the same boundaries and bucket count")
        return None  # reference quirk (EquiWidthHistogram4LT.java:66-73)


class SplitAndMergeWithDDSketch(Synopsis):
    mergeable = True

    def __init__(self, num_buckets: int, sketch_accuracy: float, gamma: float = 0.5):
        super().__init__()
        if gamma <= -1:
            raise ValueError("gamma has to be greater than -1 (!)")
        self.max_num_buckets = int(num_buckets)
        self.gamma = float(gamma)
        self.sketch_accuracy = float(sketch_accuracy)
        self.buckets = _SortedMap()  # left boundary (float) -> frequency
        self.right_most_boundary: float | None = None
        self.total_frequencies = 0.0
        self.threshold = 3
        self.dd_sketch = DDSketch(sketch_accuracy, 2048)

    def update_batch(self, values: np.ndarray, timestamps=None) -> None:
        for v in np.asarray(values, dtype=np.float64).tolist():
            self._update_one(v)

    def _update_one(self, nxt: float) -> None:
        self.dd_sketch.update_batch(np.asarray([nxt]))
        self.total_frequencies += 1
        b = self.buckets
        if b.is_empty():
            b.put(nxt, 1.0)
            self.right_most_boundary = nxt
            return
        fk = b.floor_key(nxt)
        if fk is not None:
            key = fk
            if key == b.last_key() and nxt > self.right_most_boundary:
                self.right_most_boundary = nxt
            bin_freq = b.get(key) + 1.0
            b.put(key, bin_freq)
        else:
            old_key = b.ceiling_key(nxt)
            bin_freq = b.get(old_key) + 1
            b.remove(old_key)
            key = nxt
            b.put(key, bin_freq)
        if bin_freq >= self.threshold:
            self._split_bucket(key)
            while len(b) > self.max_num_buckets:
                current_min = float("inf")
                k = b.first_key()
                n = 0.0
                while b.higher_key(k) is not None:
                    n = b.higher_key(k)
                    s = b.get(k) + b.get(n)
                    if s < current_min:
                        current_min = s
                        # NOTE: reference keeps the LAST pair scanned, not the
                        # min pair (k/n update unconditionally) — preserved
                    k = n
                if current_min < self.threshold:
                    # Java quirk (SplitAndMergeWithDDSketch.java:110-121): k and
                    # n both end at the LAST key, so remove(n) deletes the last
                    # bucket and the subsequent replace(k, ...) no-ops on the
                    # now-absent key — the merge step just drops the last bucket
                    b.remove(n)
                    if k in b.map:
                        b.put(k, current_min)
                else:
                    self._equi_depth_recompute()
                    self.threshold = round(self.total_frequencies * (2 + self.gamma))
                    break

    def _split_bucket(self, key: float) -> None:
        next_left = self._median_for_bucket(key)
        new_freq = self.buckets.get(key) / 2
        if next_left != key:
            self.buckets.put(key, new_freq)
            self.buckets.put(next_left, new_freq)
            if new_freq >= self.threshold:
                self._split_bucket(key)
                self._split_bucket(next_left)

    def _median_for_bucket(self, left_boundary: float) -> float:
        freq = self.buckets.get(left_boundary) / 2
        key = self.buckets.first_key()
        while key < left_boundary:
            freq += self.buckets.get(key)
            key = self.buckets.higher_key(key)
        return self.dd_sketch.get_value_at_quantile(freq / self.total_frequencies)

    def _equi_depth_recompute(self) -> None:
        bucket_size = self.total_frequencies / self.max_num_buckets
        left_most = self.buckets.first_key()
        self.buckets = _SortedMap()
        self.buckets.put(left_most, bucket_size)
        for i in range(1, self.max_num_buckets):
            lb = self.dd_sketch.get_value_at_quantile(i / self.max_num_buckets)
            existing = self.buckets.get(lb)
            self.buckets.put(lb, bucket_size + (existing or 0.0))

    def range_query(self, lower: float, upper: float) -> float:
        # SplitAndMergeWithDDSketch.java:213-238 (continuous-value assumption)
        b = self.buckets
        if upper < lower:
            raise ValueError("upper Bound can't be smaller than lower Bound!")
        if b.is_empty() or upper < b.first_key() or lower > self.right_most_boundary:
            return 0.0
        if upper > self.right_most_boundary:
            upper = self.right_most_boundary
        if lower < b.first_key():
            lower = b.first_key()
        if b.floor_key(lower) == b.floor_key(upper):
            hk = b.higher_key(lower)
            width = (self.right_most_boundary - b.floor_key(lower)) if hk is None else hk - b.floor_key(lower)
            if width == 0.0:
                # single-distinct-value sketch: the lone bucket has zero
                # width, so Java computes 0.0/0.0 = NaN silently
                # (SplitAndMergeWithDDSketch.java:213-238, double division);
                # Python float raises ZeroDivisionError — match Java
                return float("nan")
            return (upper - lower) / width * b.get(b.floor_key(lower))
        result = 0.0
        lb_key = b.floor_key(lower)
        width = b.higher_key(lower) - lb_key
        result += (b.higher_key(lower) - lower) / width * b.get(lb_key)
        while b.higher_key(lower) < b.floor_key(upper):
            lower = b.higher_key(lower)
            result += b.get(lower)
        ub_key = b.floor_key(upper)
        hk = b.higher_key(upper)
        width = (self.right_most_boundary - ub_key) if hk is None else hk - ub_key
        result += (upper - ub_key) / width * b.get(ub_key)
        return result

    def merge(self, other: "SplitAndMergeWithDDSketch") -> "SplitAndMergeWithDDSketch":
        if not isinstance(other, SplitAndMergeWithDDSketch):
            raise ValueError("MergeableSynopsis to be merged must be of the same type!")
        self.dd_sketch = self.dd_sketch.merge(other.dd_sketch)
        if other.right_most_boundary is not None and (
            self.right_most_boundary is None
            or self.right_most_boundary < other.right_most_boundary
        ):
            self.right_most_boundary = other.right_most_boundary
        # deliberate deviation: the reference (SplitAndMergeWithDDSketch.
        # java:274-283) crashes on an empty side (firstKey of an empty
        # TreeMap) — it documents itself as a parallelism-1 structure.  Our
        # distributed build merges empty per-partition partials routinely,
        # so an empty side is a no-op on the buckets (its dd_sketch part
        # was already merged above, with ITS reference quirks).
        if not other.buckets.keys:
            return self
        if not self.buckets.keys:
            self.buckets = other.buckets
            self.total_frequencies = other.total_frequencies
            self._equi_depth_recompute()
            return self
        left_most = min(self.buckets.first_key(), other.buckets.first_key())
        self.buckets.put(left_most, 1.0)
        # quirk preserved: totalFrequencies is NOT summed before the recompute
        self._equi_depth_recompute()
        return self

    def _ctor_args(self):
        return (self.max_num_buckets, self.sketch_accuracy, self.gamma)

    def state_dict(self):
        return {
            "keys": np.asarray(self.buckets.keys, dtype=np.float64),
            "vals": np.asarray(
                [self.buckets.map[k] for k in self.buckets.keys], dtype=np.float64
            ),
            "right": self.right_most_boundary,
            "total": self.total_frequencies,
            "threshold": self.threshold,
            "dd": self.dd_sketch.to_bytes(),
        }

    def load_state(self, state):
        self.buckets = _SortedMap()
        for k, v in zip(state["keys"].tolist(), state["vals"].tolist()):
            self.buckets.put(k, v)
        self.right_most_boundary = state["right"]
        self.total_frequencies = state["total"]
        self.threshold = state["threshold"]
        self.dd_sketch = Synopsis.from_bytes(state["dd"])
