"""Histograms: equi-width, equi-depth, and the Bar-Splitting (BASH) streaming
equi-depth histogram.

References:
- EquiWidthHistogram:  core/.../Histograms/EquiWidthHistogram.java:17-177
  (update 45-56 — out-of-range silently ignored; merge 78-93; rangeQuery
  102-138 with the continuous-value assumption).
- EquiDepthHistogram:  core/.../Histograms/EquiDepthHistogram.java (rangeQuery
  39-115, exact case analysis reproduced).
- BarSplittingHistogram: core/.../Histograms/BarSplittingHistogram.java:21-347
  (update 56-113: floor-bar accumulate + split at 1.7*total/maxBars + merge two
  smallest-adjacent; merge 186-264: weighted redistribution into the
  larger-frequency base, which MAY return the other instance; finalize 270-311).

Documented deviations:
- bar frequencies use float64 (reference uses Java float32);
- ``build_equi_depth_histogram`` breaks instead of looping forever when bars
  are exhausted (the reference would spin at BarSplittingHistogram.java:295-300);
- the readObject quirk ``numBuckets = maxNumBars * p`` is NOT reproduced (we
  serialize numBuckets directly); it only corrupts re-finalized deserialized
  sketches in the reference.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right, insort

import numpy as np

from .base import Synopsis


class EquiWidthHistogram(Synopsis):
    mergeable = True
    commutative = True

    def __init__(self, lower_bound: float, upper_bound: float, num_buckets: int):
        super().__init__()
        if upper_bound - lower_bound <= 0 or num_buckets <= 0:
            raise ValueError("lower bound has to be smaller than upper bound!")
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.num_buckets = int(num_buckets)
        self.frequency = np.zeros(self.num_buckets, dtype=np.int64)
        self.bucket_length = (self.upper_bound - self.lower_bound) / self.num_buckets

    def update_batch(self, values: np.ndarray, timestamps=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        mask = (v >= self.lower_bound) & (v < self.upper_bound)  # silently ignore rest
        idx = ((v[mask] - self.lower_bound) / self.bucket_length).astype(np.int64)
        np.clip(idx, 0, self.num_buckets - 1, out=idx)
        self.frequency += np.bincount(idx, minlength=self.num_buckets)

    def merge(self, other: "EquiWidthHistogram") -> "EquiWidthHistogram":
        if not (
            isinstance(other, EquiWidthHistogram)
            and self.lower_bound == other.lower_bound
            and self.upper_bound == other.upper_bound
            and self.num_buckets == other.num_buckets
        ):
            raise ValueError("Histograms must have the same boundaries and bucket count")
        self.frequency += other.frequency
        return self

    def range_query(self, lower: float, upper: float) -> float:
        # EquiWidthHistogram.java:102-138, ported exactly
        if upper - lower <= 0:
            raise ValueError("lower bound has to be smaller than upper bound!")
        if upper < self.lower_bound or lower > self.upper_bound:
            return 0.0
        import math

        idx_lb = int(math.floor((lower - self.lower_bound) / self.bucket_length))
        idx_ub = int(math.floor((upper - self.lower_bound) / self.bucket_length))
        if idx_lb == idx_ub:
            # quirk: a query starting exactly AT upper_bound (e.g. domain
            # [0,10), range_query(10.0, 10.5)) lands both indices at
            # num_buckets and raises IndexError — the reference throws
            # ArrayIndexOutOfBounds on the identical input
            # (EquiWidthHistogram.java:115-116); negative same-bucket pairs
            # are unreachable (the upper < lower_bound early-out fires first)
            return ((upper - lower) / self.bucket_length) * self.frequency[idx_lb]
        left_share = right_share = 0.0
        if 0 <= idx_lb < self.num_buckets:
            bucket_ub = self.lower_bound + (idx_lb + 1) * self.bucket_length
            left_share = ((bucket_ub - lower) / self.bucket_length) * self.frequency[idx_lb]
            idx_lb += 1
        else:
            idx_lb = 0
        if 0 <= idx_ub < self.num_buckets:
            bucket_ub = self.lower_bound + (idx_ub + 1) * self.bucket_length
            right_share = (1 - (bucket_ub - upper) / self.bucket_length) * self.frequency[idx_ub]
        else:
            idx_ub = self.num_buckets
        return float(left_share + right_share + self.frequency[idx_lb:idx_ub].sum())

    def _ctor_args(self):
        return (self.lower_bound, self.upper_bound, self.num_buckets)

    def state_dict(self):
        return {"frequency": self.frequency}

    def load_state(self, state):
        self.frequency = state["frequency"]


class EquiDepthHistogram:
    """Final-form equi-depth histogram (not a Synopsis — query-only result,
    like the reference class)."""

    def __init__(self, left_boundaries, right_most_boundary: float, total_frequencies: float):
        self.left_boundaries = np.asarray(left_boundaries, dtype=np.float64)
        self.right_most_boundary = float(right_most_boundary)
        self.total_frequencies = float(total_frequencies)
        self.num_buckets = len(self.left_boundaries)
        self.per_bucket_frequency = self.total_frequencies / self.num_buckets

    def range_query(self, lower: float, upper: float) -> float:
        # EquiDepthHistogram.java:39-115, ported exactly (incl. sentinel flow)
        lb = self.left_boundaries
        n = self.num_buckets
        if upper - lower < 0:
            raise ValueError("upper Bound can't be smaller than lower Bound!")
        if upper < lb[0] or lower > self.right_most_boundary:
            raise ValueError("query Bound can't be out of histogram domain")
        first = last = False
        lower_bucket, upper_bucket = -1, -3
        if lower < lb[0] <= upper:
            lower_bucket = 0
            lower = lb[0]
            first = True
        if upper >= self.right_most_boundary >= lower:
            upper_bucket = n - 1
            upper = self.right_most_boundary
            last = True
        if lb[n - 1] <= lower <= self.right_most_boundary:
            lower_bucket = n - 1
            first = True
        if lb[n - 1] <= upper <= self.right_most_boundary:
            upper_bucket = n - 1
            last = True
        for i in range(n - 1):
            if not first and lb[i] <= lower <= lb[i + 1]:
                lower_bucket = i
                first = True
            if not last and upper <= lb[i + 1]:
                upper_bucket = i
                last = True
        if upper_bucket == n - 1:
            right_most_bucket_bound = self.right_most_boundary
        else:
            right_most_bucket_bound = lb[upper_bucket + 1]
        if upper_bucket == lower_bucket:
            fraction = (upper - lower) / (right_most_bucket_bound - lb[lower_bucket])
            return float(fraction * self.per_bucket_frequency)
        mid = upper_bucket - lower_bucket - 1
        leftmost = (min(upper, lb[lower_bucket + 1]) - lower) / (
            lb[lower_bucket + 1] - lb[lower_bucket]
        )
        rightmost = (upper - lb[upper_bucket]) / (
            right_most_bucket_bound - lb[upper_bucket]
        )
        return float((mid + leftmost + rightmost) * self.per_bucket_frequency)


class _SortedMap:
    """Tiny TreeMap<int, float> replacement (bounded by maxNumBars)."""

    __slots__ = ("keys", "map")

    def __init__(self):
        self.keys: list[int] = []
        self.map: dict[int, float] = {}

    def __len__(self):
        return len(self.map)

    def is_empty(self):
        return not self.map

    def get(self, k):
        return self.map.get(k)

    def put(self, k, v):
        if k not in self.map:
            insort(self.keys, k)
        self.map[k] = v

    def remove(self, k):
        v = self.map.pop(k)
        i = bisect_left(self.keys, k)
        del self.keys[i]
        return v

    def floor_key(self, k):
        i = bisect_right(self.keys, k)
        return self.keys[i - 1] if i else None

    def ceiling_key(self, k):
        i = bisect_left(self.keys, k)
        return self.keys[i] if i < len(self.keys) else None

    def higher_key(self, k):
        i = bisect_right(self.keys, k)
        return self.keys[i] if i < len(self.keys) else None

    def first_key(self):
        return self.keys[0]

    def last_key(self):
        return self.keys[-1]

    def items(self):
        return [(k, self.map[k]) for k in self.keys]


class BarSplittingHistogram(Synopsis):
    MAXCOEF = 1.7

    mergeable = True
    merge_preserves_other = False  # merge drains the smaller side's bars

    def __init__(self, precision: int = 7, num_buckets: int | None = None):
        super().__init__()
        if num_buckets is None:  # single-arg ctor: (numBuckets)
            num_buckets = precision
            precision = 7
        self.p = int(precision)
        self.num_buckets = int(num_buckets)
        self.max_num_bars = self.num_buckets * self.p
        self.bars = _SortedMap()
        self.right_boundary = 0
        self.total_frequencies = 0.0

    # -- update (BarSplittingHistogram.java:56-113) ------------------------
    def _update_weighted(self, value: int, freq: float) -> None:
        bars = self.bars
        self.total_frequencies += freq
        max_size = (self.MAXCOEF * self.total_frequencies) / self.max_num_bars
        nxt = int(value)
        if bars.is_empty():
            bars.put(nxt, freq)
            self.right_boundary = nxt
            return
        fk = bars.floor_key(nxt)
        if fk is not None:
            key = fk
            if key == bars.last_key() and nxt > self.right_boundary:
                self.right_boundary = nxt
            bin_freq = bars.get(key) + freq
            bars.put(key, bin_freq)
        else:  # new leftmost boundary
            key = bars.ceiling_key(nxt)
            bin_freq = bars.get(key) + freq
            bars.remove(key)
            key = nxt
            bars.put(key, bin_freq)
        if bin_freq > max_size:
            self._split_bin(key, max_size)
            while len(bars) > self.max_num_bars:
                # merge two smallest adjacent bars
                current_min = float("inf")
                low_key = 0
                ks = bars.keys
                for i in range(len(ks) - 1):
                    s = bars.map[ks[i]] + bars.map[ks[i + 1]]
                    if s < current_min:
                        low_key = ks[i]
                        current_min = s
                bars.remove(bars.higher_key(low_key))
                bars.put(low_key, current_min)

    def _split_bin(self, left_key: int, max_size: float) -> None:
        bars = self.bars
        current = bars.get(left_key)
        if current > max_size:
            next_right = (
                self.right_boundary
                if left_key == bars.last_key()
                else bars.higher_key(left_key)
            )
            # Java int division truncates toward ZERO (BarSplittingHistogram
            # .java:122); Python // floors, diverging when the sum is negative
            # and odd — e.g. -3: Java -1, floor -2 — which would shift every
            # downstream bar layout on negative-valued streams
            s = next_right + left_key
            next_left = s // 2 if s >= 0 else -((-s) // 2)
            if next_left != left_key:
                current = current / 2
                bars.put(left_key, current)
                bars.put(next_left, current)
                self._split_bin(left_key, max_size)
                self._split_bin(next_left, max_size)

    def update_batch(self, values: np.ndarray, timestamps=None) -> None:
        for v in np.asarray(values).astype(np.int64).tolist():
            self._update_weighted(v, 1.0)

    # -- merge (BarSplittingHistogram.java:186-264) ------------------------
    def merge(self, other: "BarSplittingHistogram") -> "BarSplittingHistogram":
        if not isinstance(other, BarSplittingHistogram):
            raise ValueError("MergeableSynopsis to be merged must be of the same type!")
        if self.total_frequencies > other.total_frequencies:
            base, o = self, other
        else:
            base, o = other, self
        other_bars = o.bars
        base_bars = base.bars
        for _ in range(len(other_bars)):
            other_lb = other_bars.first_key()
            frequency = other_bars.remove(other_lb)
            other_ub = o.right_boundary if other_bars.is_empty() else other_bars.first_key()
            fk = base_bars.floor_key(other_lb)
            if fk is not None:
                base_lb = fk
                hk = base_bars.higher_key(base_lb)
                base_ub = hk if hk is not None else base.right_boundary
            else:
                base_lb = other_lb
                hk = base_bars.higher_key(base_bars.first_key())
                base_ub = hk if hk is not None else base.right_boundary
            # quirk: a ZERO-WIDTH other bar (single-distinct-value side,
            # other_lb == other_ub) never enters this loop, so its entire
            # frequency is dropped and totalFrequencies under-counts — the
            # reference does the same (BarSplittingHistogram.java:237 skips
            # the loop; totalFrequencies only grows inside update())
            while base_lb < other_ub:
                other_width = other_ub - other_lb
                if base_ub <= base_lb and base_bars.last_key() != base_lb:
                    # deviation (documented): the reference spins forever here
                    # (BarSplittingHistogram.java:238-257) — after a leftmost
                    # relocation the tail bar can pin base_lb at
                    # right_boundary with last_key < base_lb, so the
                    # boundary-extending `lastKey == baseLB` branch never
                    # fires and baseLB never advances.  (When last_key DOES
                    # equal base_lb the reference's own branch extends the
                    # boundary and terminates — that path is left exactly
                    # as-is.)  Route the other bar's
                    # remaining (uncredited) fraction through the
                    # boundary-extending update and stop — same total weight,
                    # guaranteed progress, identical results on every stream
                    # that doesn't hit the reference's hang.
                    remaining = (
                        frequency * (other_ub - max(other_lb, base_lb)) / other_width
                        if other_width
                        else frequency
                    )
                    base._update_weighted(other_ub, remaining)
                    break
                covered = min(other_ub, base_ub) - max(other_lb, base_lb)
                weighted = frequency * covered / other_width if other_width else frequency
                if base_bars.last_key() == base_lb:
                    base._update_weighted(other_ub, weighted)
                else:
                    base._update_weighted(base_lb, weighted)
                base_lb = base_ub
                hk = base_bars.higher_key(base_ub)
                base_ub = hk if hk is not None else base.right_boundary
        return base

    # -- finalize (BarSplittingHistogram.java:270-311) ---------------------
    def build_equi_depth_histogram(self) -> EquiDepthHistogram | None:
        bars = self.bars
        if bars.is_empty():
            return None
        if len(bars) == 1:
            return EquiDepthHistogram(
                [float(bars.first_key())], self.right_boundary, self.total_frequencies
            )
        boundaries = np.zeros(self.num_buckets, dtype=np.float64)
        boundaries[0] = bars.first_key()
        b = bars.first_key()
        count = bars.get(b)
        ideal = self.total_frequencies / self.num_buckets
        for i in range(1, self.num_buckets):
            while count <= ideal:
                hk = bars.higher_key(b)
                if hk is not None:
                    b = hk
                    count += bars.get(b)
                else:
                    break  # deviation: reference would loop forever here
            surplus = count - ideal
            hk = bars.higher_key(b)
            rb = hk if hk is not None else self.right_boundary
            boundaries[i] = b + (rb - b) * (1 - (surplus / bars.get(b)))
            count = surplus
        return EquiDepthHistogram(boundaries, self.right_boundary, self.total_frequencies)

    def _ctor_args(self):
        return (self.p, self.num_buckets)

    def state_dict(self):
        return {
            "keys": np.asarray(self.bars.keys, dtype=np.int64),
            "vals": np.asarray([self.bars.map[k] for k in self.bars.keys], dtype=np.float64),
            "right_boundary": self.right_boundary,
            "total_frequencies": self.total_frequencies,
        }

    def load_state(self, state):
        self.bars = _SortedMap()
        for k, v in zip(state["keys"].tolist(), state["vals"].tolist()):
            self.bars.put(k, v)
        self.right_boundary = state["right_boundary"]
        self.total_frequencies = state["total_frequencies"]
