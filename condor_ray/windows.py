"""Window algebra: tumbling / sliding (slice-based and bucketing) / session /
count windows, with vectorized assignment over epoch-microsecond int64 arrays.

Reference semantics:
- Tumbling: Flink ``timeWindow(size)`` aligned to the epoch
  (conn/.../processor/SynopsisBuilder.java:218-221) — window_id = ts // size.
- Sliding: either independent "buckets" (forceBucketing,
  SynopsisBuilder.java:247-296) or Scotty stream slicing — slices of
  gcd(size, slide), window = union of overlapping slices.
- Session: Scotty session windows — per-key gap merge.
- Count: ``countWindow(size / parallelism)`` per key in the reference
  (SynopsisBuilder.java:220); we deviate (documented, SURVEY §7): count
  windows are defined on GLOBAL row ordinals in arrival order, which makes
  the result independent of the parallelism level.

Timestamps are int64 **microseconds** since epoch (Arrow ``timestamp[us]``);
window sizes are given in milliseconds to mirror the reference API.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

US_PER_MS = 1000


@dataclass(frozen=True)
class TumblingWindow:
    size_ms: int

    @property
    def size_us(self) -> int:
        return self.size_ms * US_PER_MS


@dataclass(frozen=True)
class SlidingWindow:
    size_ms: int
    slide_ms: int

    @property
    def size_us(self) -> int:
        return self.size_ms * US_PER_MS

    @property
    def slide_us(self) -> int:
        return self.slide_ms * US_PER_MS

    @property
    def slice_us(self) -> int:
        return math.gcd(self.size_us, self.slide_us)

    @property
    def windows_per_row(self) -> int:
        return -(-self.size_us // self.slide_us)  # ceil


@dataclass(frozen=True)
class SessionWindow:
    gap_ms: int

    @property
    def gap_us(self) -> int:
        return self.gap_ms * US_PER_MS


@dataclass(frozen=True)
class CountWindow:
    size: int  # rows per window, on global arrival ordinals


Window = TumblingWindow | SlidingWindow | SessionWindow | CountWindow


# -- vectorized assignment -------------------------------------------------

def assign_tumbling(ts_us: np.ndarray, window: TumblingWindow) -> np.ndarray:
    """window_id per row (int64). Bounds: [id*size, (id+1)*size)."""
    return ts_us // window.size_us


def tumbling_bounds(window_id: np.ndarray | int, window: TumblingWindow):
    start = np.multiply(window_id, window.size_us)
    return start, start + window.size_us


def assign_sliding_bucketing(ts_us: np.ndarray, window: SlidingWindow):
    """Bucketing path: each row joins every window containing it.

    Returns (row_indices, window_ids): parallel arrays, one entry per
    (row, window) pair — the caller repeats the row's values.
    Window w spans [w*slide, w*slide + size).

    Documented deviation: window ids are clamped at 0, so a row with
    ts < size - slide joins fewer windows than Flink's sliding assigner
    (which also emits the negative-start windows reaching back past the
    epoch).  Real streams carry epoch-us timestamps ~1.7e15, where the
    first size/slide windows of year 1970 never occur; the oracle SQL
    twins clamp the same way (``windows_of_slice`` mirrors this with its
    ``w >= 0`` floor).
    """
    n = len(ts_us)
    k = window.windows_per_row
    w_max = ts_us // window.slide_us
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    wids = (w_max[:, None] - np.arange(k, dtype=np.int64)[None, :]).ravel()
    starts = wids * window.slide_us
    valid = (wids >= 0) & (starts + window.size_us > ts_us[rows]) & (starts <= ts_us[rows])
    return rows[valid], wids[valid]


def sliding_bounds(window_id: np.ndarray | int, window: SlidingWindow):
    start = np.multiply(window_id, window.slide_us)
    return start, start + window.size_us


def assign_slices(ts_us: np.ndarray, slice_us: int) -> np.ndarray:
    """Scotty-style stream slicing: slice_id = ts // slice_len.  One partial
    synopsis per slice serves every window definition that overlaps it."""
    return ts_us // slice_us


def windows_of_slice(slice_id: int, slice_us: int, window: SlidingWindow) -> list[int]:
    """All sliding-window ids whose span covers the given slice."""
    s_start = slice_id * slice_us
    s_end = s_start + slice_us
    w_max = s_start // window.slide_us
    out = []
    w = w_max
    while w >= 0:
        w_start = w * window.slide_us
        if w_start + window.size_us <= s_start:
            break
        if w_start < s_end:
            out.append(w)
        w -= 1
    return out


def slices_of_window(window_id: int, window: SlidingWindow, slice_us: int) -> range:
    """Slice ids composing one sliding window (window must align to slices)."""
    start = window_id * window.slide_us
    end = start + window.size_us
    return range(start // slice_us, -(-end // slice_us))


def sessionize(ts_us_sorted: np.ndarray, gap_us: int) -> np.ndarray:
    """Session ordinals for ts-sorted rows of ONE key: a new session starts
    when the gap to the previous row is >= gap (Flink session semantics:
    windows merge while gap < sessionGap)."""
    if len(ts_us_sorted) == 0:
        return np.empty(0, dtype=np.int64)
    gaps = np.diff(ts_us_sorted)
    return np.concatenate([[0], np.cumsum(gaps >= gap_us)]).astype(np.int64)
