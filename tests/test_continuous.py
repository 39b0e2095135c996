"""Continuous query evaluation: standing queries re-evaluate per close
cycle; queries arriving before the first synopsis buffer, then flush
(QueryLatestFunction.java:42-60 semantics)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from condor_ray.config import BuildConfiguration, KeySpec
from condor_ray.engine.streaming import StreamingSynopsisJob
from condor_ray.evaluate.continuous import ContinuousQueryLatest
from condor_ray.evaluate.queries import query_count_min
from condor_ray.hashing import java_string_hash_array
from condor_ray.windows import TumblingWindow

W_MS = 10_000  # 10 s tumbling
W_US = W_MS * 1000


def _fragment(path, ts_lo_s, rows_per_conv):
    convs = np.repeat(
        [f"conv{i}" for i in range(len(rows_per_conv))], rows_per_conv
    )
    n = len(convs)
    ts = (ts_lo_s * 1_000_000 + np.arange(n) * 1000).astype("datetime64[us]")
    pq.write_table(
        pa.table({"conv_id": pa.array(convs.tolist()), "ts": pa.array(ts)}),
        path,
    )


@pytest.fixture()
def stream(tmp_path):
    # fragment k holds data in window k's FIRST half, so after fragment k
    # the watermark has not yet closed window k — window k-1 closes instead
    paths = []
    for k, per_conv in enumerate([(3, 1), (5, 2), (7, 4)]):
        p = str(tmp_path / f"frag-{k:05d}.parquet")
        _fragment(p, ts_lo_s=10 * k, rows_per_conv=per_conv)
        paths.append(p)
    return paths


def test_buffer_then_flush_and_track_latest(ray_session, stream, tmp_path):
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(4096, 3, 7),
        windows=[TumblingWindow(W_MS)],
        key=KeySpec("conv_id", "java_hash"),
        parallelism=2,
    )
    job = StreamingSynopsisJob(cfg, str(tmp_path / "out"), columns=["conv_id", "ts"])
    keys = java_string_hash_array(["conv0", "conv1"]).astype(np.int64)
    standing = pd.DataFrame({"query_key": keys, "conv": ["conv0", "conv1"]})
    ev = ContinuousQueryLatest(job, query_count_min)
    res = ev.run(stream, lambda k: standing)
    job.shutdown()

    # cycle 0: no window closed yet -> queries buffered, no cycle-0 rows
    assert (res["cycle"] == 0).sum() == 0
    # cycle 1: window 0 closes; the buffered cycle-0 queries FLUSH here, so
    # cycle 1 carries two evaluations (flushed + standing), both vs window 0
    c1 = res[res["cycle"] == 1]
    assert len(c1) == 4
    assert (c1["window_start"] == 0).all()
    got = c1.groupby("conv")["result"].unique()
    assert list(got["conv0"]) == [3] and list(got["conv1"]) == [1]
    # cycle 2: latest is window 1
    c2 = res[res["cycle"] == 2]
    assert (c2["window_start"] == W_US).all()
    assert c2.set_index("conv")["result"]["conv0"] == 5
    # final flush cycle: latest is window 2
    c3 = res[res["cycle"] == 3]
    assert (c3["window_start"] == 2 * W_US).all()
    assert c3.set_index("conv")["result"]["conv1"] == 4
    # standing query answers are monotone in window_start across cycles
    per_cycle = res.groupby("cycle")["window_start"].max()
    assert per_cycle.is_monotonic_increasing


def _cm_job(tmp_path, name="out_ts"):
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(4096, 3, 7),
        windows=[TumblingWindow(W_MS)],
        key=KeySpec("conv_id", "java_hash"),
        parallelism=2,
    )
    return StreamingSynopsisJob(
        cfg, str(tmp_path / name), columns=["conv_id", "ts"]
    )


def test_timestamped_buffer_flush_and_floor_routing(ray_session, stream, tmp_path):
    """QueryTimestampedFunction.java:51-66,91-95: queries pre-dating the
    first synopsis buffer; the flush answers ONLY those whose ts falls in
    the first window — the rest of the buffer is silently lost.  Later
    queries floor-route into the archive; ts beyond the covering window is
    dropped."""
    from condor_ray.evaluate.continuous import ContinuousQueryTimestamped

    job = _cm_job(tmp_path)
    k0 = int(java_string_hash_array(["conv0"])[0])
    arrivals = {
        # cycle 0 (no synopsis yet): one query in window 0, one in window 1
        0: pd.DataFrame(
            {"query_key": [k0, k0], "query_ts": [5 * 1_000_000, 15 * 1_000_000],
             "tag": ["w0", "w1-lost"]}
        ),
        # final cycle: archive holds all 3 windows
        3: pd.DataFrame(
            {"query_key": [k0, k0, k0],
             "query_ts": [15 * 1_000_000, 25 * 1_000_000, 35 * 1_000_000],
             "tag": ["w1", "w2", "beyond-dropped"]}
        ),
    }
    ev = ContinuousQueryTimestamped(job, query_count_min)
    res = ev.run(stream, arrivals)
    job.shutdown()

    tags = set(res["tag"])
    # the in-first-window buffered query flushed against window 0...
    w0 = res[res["tag"] == "w0"]
    assert len(w0) == 1
    assert int(w0["window_start"].iloc[0]) == 0
    assert int(w0["result"].iloc[0]) == 3
    # ...the out-of-first-window buffered query was lost (reference quirk)
    assert "w1-lost" not in tags
    # floor routing at the final cycle
    w1 = res[res["tag"] == "w1"]
    assert int(w1["window_start"].iloc[0]) == W_US
    assert int(w1["result"].iloc[0]) == 5
    w2 = res[res["tag"] == "w2"]
    assert int(w2["window_start"].iloc[0]) == 2 * W_US
    assert int(w2["result"].iloc[0]) == 7
    # ts past the last window's end: floor window doesn't cover it -> drop
    assert "beyond-dropped" not in tags


def test_timestamped_archive_eviction(ray_session, stream, tmp_path):
    """QueryTimestampedFunction.java:77-79: at max_synopsis_count the
    OLDEST window (smallest windowStart) is evicted, so queries into the
    evicted range are dropped while archived ranges still answer."""
    from condor_ray.evaluate.continuous import ContinuousQueryTimestamped

    job = _cm_job(tmp_path, "out_evict")
    k0 = int(java_string_hash_array(["conv0"])[0])
    arrivals = {
        3: pd.DataFrame(
            {"query_key": [k0, k0],
             "query_ts": [5 * 1_000_000, 12 * 1_000_000],
             "tag": ["evicted", "kept"]}
        )
    }
    ev = ContinuousQueryTimestamped(job, query_count_min, max_synopsis_count=2)
    res = ev.run(stream, arrivals)
    job.shutdown()

    assert list(res["tag"]) == ["kept"]
    assert int(res["window_start"].iloc[0]) == W_US
    assert int(res["result"].iloc[0]) == 5


def _strat_fragment(path, ts_lo_s, role_counts):
    """role_counts: dict role -> rows (all rows in window ts_lo_s//10)."""
    roles = np.concatenate(
        [np.repeat(r, n) for r, n in role_counts.items()]
    ) if role_counts else np.array([], dtype=object)
    n = len(roles)
    ts = (ts_lo_s * 1_000_000 + np.arange(n) * 1000).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([f"c{i}" for i in range(n)]),
                "role": pa.array(roles.tolist()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
                "ts": pa.array(ts),
            }
        ),
        path,
    )


def test_stratified_latest_per_stratum_buffer_flush(ray_session, tmp_path):
    """QueryLatestStratifiedFunction.java:55-63,74-84: buffering and flush
    are PER STRATUM — stratum A's first synopsis answers only A's buffered
    queries; B's stay buffered until B first emits.  Latest is overwritten
    per stratum on arrival (:86)."""
    from condor_ray.evaluate.continuous import ContinuousQueryLatestStratified

    # window 0: only role A; window 1: A and B; window 2: only B
    paths = []
    for k, rc in enumerate(
        [{"A": 3}, {"A": 5, "B": 2}, {"B": 7}]
    ):
        p = str(tmp_path / f"sfrag-{k:05d}.parquet")
        _strat_fragment(p, ts_lo_s=10 * k, role_counts=rc)
        paths.append(p)

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(4096, 3, 7),
        windows=[TumblingWindow(W_MS)],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
        parallelism=2,
    )
    job = StreamingSynopsisJob(
        cfg, str(tmp_path / "out_strat"),
        columns=["conv_id", "role", "turn_idx", "ts"],
    )
    standing = pd.DataFrame(
        {"query_key": np.zeros(2, dtype=np.int64), "stratum": ["A", "B"]}
    )
    ev = ContinuousQueryLatestStratified(job, query_count_min)
    res = ev.run(paths, lambda k: standing)
    job.shutdown()

    # cycle 0: nothing closed -> both strata buffered
    assert (res["cycle"] == 0).sum() == 0
    # cycle 1: window 0 closes with ONLY stratum A -> A's buffer flushes
    # (cycle-0 + cycle-1 arrivals = 2 rows); B stays buffered
    c1 = res[res["cycle"] == 1]
    assert set(c1["stratum"]) == {"A"}
    assert len(c1) == 2
    assert (c1["result"] == 3).all() and (c1["window_start"] == 0).all()
    # cycle 2: window 1 closes with A and B -> B's buffer (cycles 0..2
    # minus none answered yet... cycle-0,1 buffered + cycle-2 arrival)
    c2 = res[res["cycle"] == 2]
    b2 = c2[c2["stratum"] == "B"]
    assert len(b2) == 3  # two buffered frames flushed + this cycle's arrival
    assert (b2["result"] == 2).all() and (b2["window_start"] == W_US).all()
    a2 = c2[c2["stratum"] == "A"]
    assert (a2["result"] == 5).all()
    # final cycle: A's latest stays window 1 (no A rows in window 2),
    # B's latest moves to window 2
    cf = res[res["cycle"] == 3]
    assert cf.set_index("stratum")["window_start"]["A"] == W_US
    assert cf.set_index("stratum")["window_start"]["B"] == 2 * W_US
    assert cf.set_index("stratum")["result"]["B"] == 7


def test_stratified_timestamped_per_stratum_archive(ray_session, tmp_path):
    """QueryStratifiedTimestampedFunction.java:45-55,76-93: floor routing
    and eviction are per stratum — evicting A's oldest window does not
    affect B's archive; buffered queries flush only against their own
    stratum's first synopsis and only for matching timestamps."""
    from condor_ray.evaluate.continuous import (
        ContinuousQueryTimestampedStratified,
    )

    paths = []
    for k, rc in enumerate([{"A": 3}, {"A": 5, "B": 2}, {"A": 6, "B": 7}]):
        p = str(tmp_path / f"tfrag-{k:05d}.parquet")
        _strat_fragment(p, ts_lo_s=10 * k, role_counts=rc)
        paths.append(p)

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(4096, 3, 7),
        windows=[TumblingWindow(W_MS)],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
        parallelism=2,
    )
    job = StreamingSynopsisJob(
        cfg, str(tmp_path / "out_stratts"),
        columns=["conv_id", "role", "turn_idx", "ts"],
    )
    arrivals = {
        # cycle 0, pre-synopsis: A-query in window 0 (flushes), A-query in
        # window 1 (lost), B-query in window 0 (B has no window 0: when B's
        # FIRST synopsis (window 1) arrives, ts doesn't match -> lost)
        0: pd.DataFrame(
            {"query_key": np.zeros(3, dtype=np.int64),
             "query_ts": [5_000_000, 15_000_000, 5_000_000],
             "stratum": ["A", "A", "B"],
             "tag": ["a-w0", "a-w1-lost", "b-w0-lost"]}
        ),
        # final cycle: with max_synopsis_count=2, A's archive holds windows
        # 1,2 (0 evicted) while B's holds 1,2 untouched
        3: pd.DataFrame(
            {"query_key": np.zeros(3, dtype=np.int64),
             "query_ts": [5_000_000, 15_000_000, 15_000_000],
             "stratum": ["A", "A", "B"],
             "tag": ["a-evicted", "a-w1", "b-w1"]}
        ),
    }
    ev = ContinuousQueryTimestampedStratified(
        job, query_count_min, max_synopsis_count=2
    )
    res = ev.run(paths, arrivals)
    job.shutdown()

    tags = set(res["tag"])
    assert "a-w0" in tags and "a-w1-lost" not in tags and "b-w0-lost" not in tags
    a0 = res[res["tag"] == "a-w0"]
    assert int(a0["result"].iloc[0]) == 3 and int(a0["window_start"].iloc[0]) == 0
    assert "a-evicted" not in tags  # A's window 0 evicted at cap 2
    a1 = res[res["tag"] == "a-w1"]
    assert int(a1["result"].iloc[0]) == 5 and int(a1["window_start"].iloc[0]) == W_US
    b1 = res[res["tag"] == "b-w1"]
    assert int(b1["result"].iloc[0]) == 2 and int(b1["window_start"].iloc[0]) == W_US


def test_bounded_archive_structure():
    """_BoundedArchive: head-pointer eviction + compaction must preserve the
    TreeSet view (sorted live entries, oldest-evicted) through long
    insert/evict streams and out-of-order arrivals."""
    import numpy as np

    from condor_ray.evaluate.continuous import _BoundedArchive

    arch = _BoundedArchive(cap=5)
    # long in-order stream: 100 inserts at cap 5 -> many evict+compact cycles
    for w in range(100):
        arch.insert(w * 10, w * 10 + 10, str(w).encode())
    starts, ends = arch.views()
    assert len(arch) == 5
    assert list(starts) == [950, 960, 970, 980, 990]
    assert list(ends) == [960, 970, 980, 990, 1000]
    assert [arch.payload(i) for i in range(5)] == [b"95", b"96", b"97", b"98", b"99"]
    # out-of-order insert lands sorted (and evicts the oldest first)
    arch.insert(965, 975, b"late")
    starts2, _ = arch.views()
    assert list(starts2) == [960, 965, 970, 980, 990]
    assert arch.payload(1) == b"late"
    # views() caching invalidates on mutation
    assert np.shares_memory(starts2, arch.views()[0])
    # evicted payload slots are nulled IMMEDIATELY (peak payload memory is
    # O(cap), not O(2 x cap) waiting for compaction)
    assert all(p is None for p in arch._payloads[: arch._head])
