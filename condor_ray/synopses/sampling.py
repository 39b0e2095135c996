"""Samplers: uniform reservoir, FiFo (newest-k), biased reservoir.

References:
- ReservoirSampler:        core/.../Sampling/ReservoirSampler.java:25-250
  (update 58-69; weighted merge 92-140 drawing from each side with probability
  proportional to processedElements; index lists without replacement).
- FiFoSampler:             core/.../Sampling/FiFoSampler.java:14-129
  (TreeSet keyed by timestamp — equal timestamps COLLAPSE, quirk preserved;
  merge keeps the k newest overall by polling the larger last element).
- BiasedReservoirSampler:  core/.../Sampling/BiasedReservoirSampler.java:26-304
  (replace w.p. actualSize/sampleSize — i.e. ALWAYS once full; merge builds a
  NEW sampler taking "newest"-first from both, with the reference's inverted
  comparison at :86 preserved: it takes from the side whose newest timestamp
  is SMALLER first).
- TimestampedElement:      core/.../Sampling/TimestampedElement.java:17-52.

Documented deviation: the reference constructs its XORShiftRandom UNSEEDED
(nondeterministic output, ReservoirSampler.java:39); we require reproducible
runs, so all samplers take an explicit ``seed`` (default 7) feeding the same
XORShift generator.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import numpy as np

from ..hashing import XORShiftRandom
from .base import Synopsis


class TimestampedElement:
    __slots__ = ("value", "timestamp")

    def __init__(self, value, timestamp: int):
        self.value = value
        self.timestamp = int(timestamp)

    def __lt__(self, other):
        return self.timestamp < other.timestamp

    def __eq__(self, other):
        return isinstance(other, TimestampedElement) and self.timestamp == other.timestamp

    def __hash__(self):
        return hash(self.timestamp)

    def __repr__(self):
        return f"TimestampedElement({self.value!r}, {self.timestamp})"

    def __reduce__(self):
        return (TimestampedElement, (self.value, self.timestamp))


class ReservoirSampler(Synopsis):
    mergeable = True
    commutative = True

    def __init__(self, sample_size: int, seed: int = 7):
        super().__init__()
        self.sample_size = int(sample_size)
        self.seed = int(seed)
        self.rand = XORShiftRandom(seed)
        self.sample: list = [None] * self.sample_size
        self.processed_elements = 0

    def update_batch(self, values, timestamps=None) -> None:
        # faithful sequential RNG consumption (ReservoirSampler.java:58-69)
        k = self.sample_size
        rand = self.rand
        sample = self.sample
        n = self.processed_elements
        if isinstance(values, np.ndarray):
            values = values.tolist()
        for v in values:
            if n < k:
                sample[n] = v
                n += 1
            else:
                n += 1
                if rand.next_double() < k / n:
                    sample[rand.next_int_bound(k)] = v
        self.processed_elements = n

    def get_sample(self) -> list:
        return self.sample[: min(self.processed_elements, self.sample_size)]

    def merge(self, other: "ReservoirSampler") -> "ReservoirSampler":
        if not (isinstance(other, ReservoirSampler) and other.sample_size == self.sample_size):
            raise ValueError("Reservoir Samplers to merge have to be the same size")
        k = self.sample_size
        rand = self.rand
        idx1 = list(range(min(self.processed_elements, k)))
        idx2 = list(range(min(other.processed_elements, k)))
        total = self.processed_elements + other.processed_elements
        prob = self.processed_elements / total if total else 0.0
        result = [None] * k
        actual = 0
        while actual != k and (idx1 or idx2):
            if rand.next_double() < prob:
                if idx1:
                    result[actual] = self.sample[idx1.pop(rand.next_int_bound(len(idx1)))]
                else:
                    result[actual] = other.sample[idx2.pop(rand.next_int_bound(len(idx2)))]
            else:
                if idx2:
                    result[actual] = other.sample[idx2.pop(rand.next_int_bound(len(idx2)))]
                else:
                    result[actual] = self.sample[idx1.pop(rand.next_int_bound(len(idx1)))]
            actual += 1
        self.sample = result
        self.processed_elements += other.processed_elements
        return self

    def _ctor_args(self):
        return (self.sample_size, self.seed)

    def state_dict(self):
        return {
            "sample": list(self.sample),
            "processed_elements": self.processed_elements,
            "rng_state": self.rand._seed,
        }

    def load_state(self, state):
        self.sample = list(state["sample"])
        self.processed_elements = state["processed_elements"]
        self.rand._seed = state["rng_state"]


class FiFoSampler(Synopsis):
    mergeable = True
    timestamped = True
    merge_preserves_other = False  # merge polls elements out of `other`

    def __init__(self, sample_size: int, event_time: bool = True):
        super().__init__()
        self.sample_size = int(sample_size)
        self.event_time = bool(event_time)
        # sorted unique timestamps (TreeSet<TimestampedElement> keyed by ts)
        self._ts: list[int] = []
        self._by_ts: dict[int, TimestampedElement] = {}

    def _add(self, el: TimestampedElement) -> bool:
        if el.timestamp in self._by_ts:
            return False  # TreeSet.add: equal-ts element NOT inserted (quirk)
        insort(self._ts, el.timestamp)
        self._by_ts[el.timestamp] = el
        return True

    def _poll_first(self) -> TimestampedElement:
        ts = self._ts.pop(0)
        return self._by_ts.pop(ts)

    def _poll_last(self) -> TimestampedElement:
        ts = self._ts.pop()
        return self._by_ts.pop(ts)

    def update_batch(self, values, timestamps=None) -> None:
        if timestamps is None:
            raise ValueError("FiFoSampler requires timestamps")
        if isinstance(values, np.ndarray):
            values = values.tolist()
        ts_list = timestamps.tolist() if isinstance(timestamps, np.ndarray) else list(timestamps)
        for v, t in zip(values, ts_list):
            el = TimestampedElement(v, t)
            if len(self._ts) < self.sample_size:
                self._add(el)
            elif self._ts[0] < el.timestamp:
                self._poll_first()
                self._add(el)

    def get_sample(self) -> list[TimestampedElement]:
        return [self._by_ts[t] for t in self._ts]

    def merge(self, other: "FiFoSampler") -> "FiFoSampler":
        if not (
            isinstance(other, FiFoSampler)
            and other.sample_size == self.sample_size
            and other.event_time == self.event_time
        ):
            raise ValueError("FiFoSamplers to merge have to be the same size")
        result = FiFoSampler(self.sample_size, self.event_time)
        while len(result._ts) != self.sample_size and (self._ts or other._ts):
            if other._ts and self._ts:
                if other._ts[-1] > self._ts[-1]:
                    result._add(other._poll_last())
                else:
                    result._add(self._poll_last())
            elif not other._ts:
                result._add(self._poll_last())
            else:
                result._add(other._poll_last())
        self._ts = result._ts
        self._by_ts = result._by_ts
        return self

    def _ctor_args(self):
        return (self.sample_size, self.event_time)

    def state_dict(self):
        return {"elements": [(self._by_ts[t].value, t) for t in self._ts]}

    def load_state(self, state):
        self._ts = []
        self._by_ts = {}
        for v, t in state["elements"]:
            self._add(TimestampedElement(v, t))


class BiasedReservoirSampler(Synopsis):
    mergeable = True
    timestamped = True
    merge_preserves_other = False  # merge drains LatestPositions of `other`

    def __init__(self, sample_size: int, seed: int = 7):
        super().__init__()
        self.sample_size = int(sample_size)
        self.seed = int(seed)
        self.rand = XORShiftRandom(seed)
        self.sample: list[TimestampedElement | None] = [None] * self.sample_size
        self.actual_size = 0
        self.merged = 1
        # LatestPositions: ts -> [positions] (BiasedReservoirSampler.java:186-303)
        self._pos_ts: list[int] = []  # sorted unique timestamps
        self._positions: dict[int, list[int]] = {}
        self._n_elements = 0

    # -- LatestPositions helpers ------------------------------------------
    def _lp_add(self, ts: int, pos: int):
        lst = self._positions.get(ts)
        if lst is None:
            insort(self._pos_ts, ts)
            self._positions[ts] = [pos]
        else:
            lst.append(pos)
        self._n_elements += 1

    def _lp_remove(self, ts: int, pos: int):
        self._n_elements -= 1
        lst = self._positions[ts]
        lst.remove(pos)
        if not lst:
            del self._positions[ts]
            self._ts_remove(ts)

    def _ts_remove(self, ts: int):
        i = bisect_left(self._pos_ts, ts)
        del self._pos_ts[i]

    def _lp_remove_newest(self) -> int:
        self._n_elements -= 1
        ts = self._pos_ts[-1]
        lst = self._positions[ts]
        if len(lst) == 1:
            self._pos_ts.pop()
            del self._positions[ts]
            return lst[0]
        return lst.pop()

    def _lp_newest_ts(self) -> int:
        return self._pos_ts[-1] if self._n_elements > 0 else -1

    # -- update (BiasedReservoirSampler.java:56-70) -----------------------
    def _update_one(self, el: TimestampedElement):
        if self.actual_size < self.sample_size:
            self.sample[self.actual_size] = el
            self._lp_add(el.timestamp, self.actual_size)
            self.actual_size += 1
        elif self.rand.next_double() < self.actual_size / self.sample_size:
            position = self.rand.next_int_bound(self.actual_size)
            self._lp_remove(self.sample[position].timestamp, position)
            self.sample[position] = el
            self._lp_add(el.timestamp, position)

    def update_batch(self, values, timestamps=None) -> None:
        if timestamps is None:
            raise ValueError("BiasedReservoirSampler requires timestamps")
        if isinstance(values, np.ndarray):
            values = values.tolist()
        ts_list = timestamps.tolist() if isinstance(timestamps, np.ndarray) else list(timestamps)
        for v, t in zip(values, ts_list):
            self._update_one(TimestampedElement(v, t))

    def get_sample(self) -> list[TimestampedElement]:
        return [e for e in self.sample[: self.actual_size]]

    def merge(self, other: "BiasedReservoirSampler") -> "BiasedReservoirSampler":
        if not (
            isinstance(other, BiasedReservoirSampler)
            and other.sample_size == self.sample_size
        ):
            raise ValueError("Reservoir Samplers to merge have to be the same size")
        result = BiasedReservoirSampler(self.sample_size, self.seed)
        # reference quirk (BiasedReservoirSampler.java:106-108): the merge
        # result takes OTHER's partition value only — self's stratum tag is
        # dropped (unlike ReservoirSampler/FiFoSampler, whose merges return
        # self and keep self's tag).  Preserved for parity; in practice the
        # distributed build only merges same-stratum partials.
        if other.partition_value is not None:
            result.set_partition_value(other.partition_value)
        result.merged = self.merged + other.merged
        merged_size = min(other._n_elements + self._n_elements, self.sample_size)
        while result._n_elements < merged_size:
            if other._n_elements == 0 and self._n_elements == 0:
                break
            if other._n_elements > 0 and self._n_elements > 0:
                # reference quirk (:86): takes the side with the SMALLER newest ts
                if other._lp_newest_ts() < self._lp_newest_ts():
                    result._update_one(other.sample[other._lp_remove_newest()])
                else:
                    result._update_one(self.sample[self._lp_remove_newest()])
            elif other._n_elements == 0:
                result._update_one(self.sample[self._lp_remove_newest()])
            else:
                result._update_one(other.sample[other._lp_remove_newest()])
        return result

    def _ctor_args(self):
        return (self.sample_size, self.seed)

    def state_dict(self):
        return {
            "sample": [(e.value, e.timestamp) if e is not None else None for e in self.sample],
            "actual_size": self.actual_size,
            "merged": self.merged,
            "rng_state": self.rand._seed,
        }

    def load_state(self, state):
        self.sample = [
            TimestampedElement(vt[0], vt[1]) if vt is not None else None
            for vt in state["sample"]
        ]
        self.actual_size = state["actual_size"]
        self.merged = state["merged"]
        self.rand._seed = state["rng_state"]
        # rebuild LatestPositions index
        self._pos_ts = []
        self._positions = {}
        self._n_elements = 0
        for i in range(self.actual_size):
            self._lp_add(self.sample[i].timestamp, i)
