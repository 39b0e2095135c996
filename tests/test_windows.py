"""Window-algebra helpers: assignment, bounds, slicing consistency."""

import numpy as np
import pytest

from condor_ray.windows import (
    SlidingWindow,
    TumblingWindow,
    assign_slices,
    assign_sliding_bucketing,
    assign_tumbling,
    sessionize,
    slices_of_window,
    sliding_bounds,
    tumbling_bounds,
    windows_of_slice,
)


def test_tumbling_assignment_and_bounds():
    w = TumblingWindow(5_000)
    ts = np.asarray([0, 4_999_999, 5_000_000, 12_345_678], dtype=np.int64)
    wid = assign_tumbling(ts, w)
    assert wid.tolist() == [0, 0, 1, 2]
    start, end = tumbling_bounds(wid, w)
    assert ((ts >= start) & (ts < end)).all()


def test_sliding_bucketing_covers_every_containing_window():
    w = SlidingWindow(10_000, 2_500)
    ts = np.asarray([0, 9_999_999, 10_000_000, 25_000_000], dtype=np.int64)
    rows, wids = assign_sliding_bucketing(ts, w)
    for r, wid in zip(rows.tolist(), wids.tolist()):
        s, e = sliding_bounds(wid, w)
        assert s <= ts[r] < e
    # each interior row appears in exactly size/slide = 4 windows
    counts = np.bincount(rows, minlength=len(ts))
    assert counts[3] == 4
    assert counts[0] == 1  # first window only (no negative window ids)


def test_slices_windows_duality():
    w = SlidingWindow(10_000, 2_500)
    slice_us = w.slice_us
    for sid in range(3, 30):
        for wid in windows_of_slice(sid, slice_us, w):
            assert sid in list(slices_of_window(wid, w, slice_us))
    for wid in range(3, 20):
        for sid in slices_of_window(wid, w, slice_us):
            assert wid in windows_of_slice(sid, slice_us, w)


def test_assign_slices_matches_tumbling():
    ts = np.arange(0, 50_000_000, 1_234_567, dtype=np.int64)
    assert (
        assign_slices(ts, 5_000_000) == assign_tumbling(ts, TumblingWindow(5_000))
    ).all()


def test_sessionize_gaps():
    ts = np.asarray([0, 1_000, 2_000, 40_000_000, 40_500_000, 90_000_000], dtype=np.int64)
    sess = sessionize(ts, 30_000_000)
    assert sess.tolist() == [0, 0, 0, 1, 1, 2]
    assert sessionize(np.empty(0, dtype=np.int64), 1).tolist() == []


class TestCountWindowModes:
    """count_window_ids: documented global-ordinal default vs the reference's
    parallelism-dependent `compat=condor` mode
    (SynopsisBuilder.java:213-233)."""

    @staticmethod
    def _flink_sim(subtasks, size, P):
        """Independent sequential simulator of the reference path: per-subtask
        round-robin onto P builders, each builder emits a partial every
        size/P elements, countWindowAll(P) merges consecutive partials."""
        import collections

        rr = collections.defaultdict(int)       # subtask -> round-robin ctr
        rank = collections.defaultdict(int)     # builder -> elements seen
        wids = []
        for st in subtasks:
            b = rr[st] % P
            rr[st] += 1
            wids.append(rank[b] // (size // P))
            rank[b] += 1
        return np.array(wids, dtype=np.int64)

    def test_single_source_condor_equals_global(self):
        from condor_ray.pipelines.sessions import count_window_ids

        ordinals = np.arange(1000, dtype=np.int64)
        g = count_window_ids(ordinals, size=100, mode="global")
        c = count_window_ids(ordinals, size=100, parallelism=4, mode="condor")
        assert np.array_equal(g, c)

    def test_two_subtask_condor_matches_flink_sim_and_differs_from_global(self):
        from condor_ray.pipelines.sessions import count_window_ids

        rng = np.random.default_rng(7)
        n = 2000
        # bursty interleaving: subtask 0 sends runs of ~50, subtask 1 runs of ~10
        subtask = []
        while len(subtask) < n:
            subtask.extend([0] * int(rng.integers(20, 80)))
            subtask.extend([1] * int(rng.integers(5, 15)))
        subtask = np.array(subtask[:n], dtype=np.int64)
        ordinals = np.arange(n, dtype=np.int64)

        c = count_window_ids(ordinals, size=100, parallelism=2,
                             mode="condor", subtask=subtask)
        g = count_window_ids(ordinals, size=100, mode="global")
        assert np.array_equal(c, self._flink_sim(subtask, 100, 2))
        # with skewed multi-subtask arrival the boundaries genuinely diverge
        assert not np.array_equal(c, g)
        # every condor window still holds exactly `size` elements (full ones)
        counts = np.bincount(c)
        assert (counts[:-1] == 100).all()

    def test_condor_mode_rejects_indivisible_size(self):
        from condor_ray.pipelines.sessions import count_window_ids

        with pytest.raises(ValueError):
            count_window_ids(np.arange(10), size=10, parallelism=3, mode="condor")
