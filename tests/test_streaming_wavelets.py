"""Streaming order-based wavelet path: parity vs the batch manager on a
sorted no-late stream; ordinal continuity across fragments."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from condor_ray.config import KeySpec
from condor_ray.engine.ordered import build_windowed_wavelets
from condor_ray.engine.streaming_wavelets import StreamingWaveletJob
from condor_ray.synopses.base import Synopsis
from condor_ray.windows import TumblingWindow

W_MS = 10_000


@pytest.fixture(scope="module")
def sorted_fragments(tmp_path_factory):
    """A ts-sorted fragment stream (no late rows) — deterministic."""
    rng = np.random.default_rng(7)
    n = 12_000
    ts = np.sort(rng.integers(0, 120_000_000, n))  # 120 s span, us
    conv = np.array([f"c{int(x)}" for x in rng.integers(0, 50, n)])
    turn = rng.integers(0, 1000, n).astype(np.int32)
    df = pd.DataFrame({"conv_id": conv, "turn_idx": turn, "ts": ts})
    df = df.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    d = tmp_path_factory.mktemp("wave_frags")
    paths = []
    bounds = np.linspace(0, n, 7).astype(int)
    for i in range(6):
        part = df.iloc[bounds[i] : bounds[i + 1]]
        t = pa.Table.from_pandas(part, preserve_index=False)
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            t["ts"].cast(pa.timestamp("us")),
        )
        p = str(d / f"fragment-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, df


def test_streaming_matches_batch_managers(ray_session, sorted_fragments, tmp_path):
    paths, df = sorted_fragments
    import ray.data as rd

    ds = rd.read_parquet(paths)
    batch = (
        build_windowed_wavelets(
            ds, TumblingWindow(W_MS), size=512, parallelism=4,
            key=KeySpec("turn_idx", "value"),
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    job = StreamingWaveletJob(
        TumblingWindow(W_MS), str(tmp_path / "out"), size=512, parallelism=4,
        key=KeySpec("turn_idx", "value"),
    )
    summary = job.run(paths)
    stream = (
        job.result_dataset().to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    job.shutdown()
    assert summary["late_dropped"] == 0
    assert list(stream["window_start"]) == list(batch["window_start"])
    assert list(stream["n_rows"]) == list(batch["n_rows"])
    # same managers -> identical point/range query results
    for (_, bs), (_, ss) in zip(batch.iterrows(), stream.iterrows()):
        mb = Synopsis.from_bytes(bs["payload"])
        ms = Synopsis.from_bytes(ss["payload"])
        n = int(bs["n_rows"])
        for lo, hi in [(0, n - 1), (0, n // 2), (n // 3, 2 * n // 3)]:
            assert ms.range_sum_query(lo, hi) == pytest.approx(
                mb.range_sum_query(lo, hi)
            )


def test_windows_emitted_incrementally(ray_session, sorted_fragments, tmp_path):
    paths, _ = sorted_fragments
    job = StreamingWaveletJob(
        TumblingWindow(W_MS), str(tmp_path / "out2"), size=512, parallelism=2,
        key=KeySpec("turn_idx", "value"),
    )
    summary = job.run(paths)
    job.shutdown()
    import os

    emits = [f for f in os.listdir(str(tmp_path / "out2")) if f.startswith("emit-")]
    # closes happen during the stream, not only at the final flush
    assert len(emits) > 1
    assert summary["windows_emitted"] == 12


class TestMiniBatchReorder:
    """`mini_batch` knob: reproduce OrderAndIndex.java:41-67's bounded
    PriorityQueue re-order (chunks of N arrivals drained in ts order) on a
    shuffled fixture, vs the default full-sort mode."""

    @staticmethod
    def _make_fragment(path, n=200, seed=3):
        rng = np.random.default_rng(seed)
        ts = rng.permutation(n).astype(np.int64) * 1000  # shuffled arrivals
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array([f"c{i}" for i in range(n)]),
                    "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
                    "ts": pa.array(ts.astype("datetime64[us]")),
                }
            ),
            path,
        )
        return ts

    @staticmethod
    def _reconstruct(shards, P):
        """Global value sequence from round-robin shards.  Shards carry no
        explicit position — row order IS the append order, so builder p's
        i-th row sits at global ordinal i*P + p (single-window fixture)."""
        seq = {}
        for p, s in enumerate(shards):
            for i, v in enumerate(s["value"].to_numpy()):
                seq[i * P + p] = v
        return [seq[i] for i in range(len(seq))]

    @staticmethod
    def _pq_sim(arrival_vals, arrival_ts, N):
        """Reference OrderAndIndex semantics: buffer N arrivals, drain the
        PriorityQueue (min-ts first) before dispatching; flush the tail."""
        import heapq

        out, buf = [], []
        for i, (v, t) in enumerate(zip(arrival_vals, arrival_ts)):
            heapq.heappush(buf, (t, i, v))
            if len(buf) == N:
                while buf:
                    out.append(heapq.heappop(buf)[2])
        while buf:
            out.append(heapq.heappop(buf)[2])
        return out

    def test_minibatch_matches_pq_simulator(self, tmp_path):
        from condor_ray.config import KeySpec
        from condor_ray.engine.streaming_wavelets import _split_wavelet_fragment

        frag = str(tmp_path / "frag.parquet")
        ts = self._make_fragment(frag)
        P, N = 3, 16
        big = 10**15  # one window holds everything
        res = _split_wavelet_fragment(
            frag, {}, P, big, -(2**62), KeySpec("turn_idx", "value"),
            None, N,
        )
        got = self._reconstruct(res[2:], P)
        # arrival value = turn_idx (KeySpec turn_idx/value), arrival ts = ts
        want = self._pq_sim(np.arange(len(ts), dtype=float), ts, N)
        assert got == want
        # the partial order differs from the full-sort default on a
        # shuffled stream, but each N-chunk is internally ts-sorted
        full = _split_wavelet_fragment(
            frag, {}, P, big, -(2**62), KeySpec("turn_idx", "value"), None,
        )
        assert got != self._reconstruct(full[2:], P)

    def test_minibatch_one_is_arrival_order(self, tmp_path):
        from condor_ray.config import KeySpec
        from condor_ray.engine.streaming_wavelets import _split_wavelet_fragment

        frag = str(tmp_path / "frag1.parquet")
        self._make_fragment(frag)
        res = _split_wavelet_fragment(
            frag, {}, 2, 10**15, -(2**62), KeySpec("turn_idx", "value"),
            None, 1,
        )
        assert self._reconstruct(res[2:], 2) == list(
            np.arange(200, dtype=float)
        )
