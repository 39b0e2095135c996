"""Evaluator joins (queryLatest/queryTimestamped/stratified) and the
turn x tool-call stream-stream join on the F2 fixture (orphans, duplicates)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from condor_ray.config import BuildConfiguration, KeySpec
from condor_ray.engine.batch import build_windowed_synopses
from condor_ray.evaluate.queries import (
    query_count_min,
    query_latest,
    query_latest_stratified,
    query_timestamped,
)
from condor_ray.hashing import java_string_hash_array
from condor_ray.pipelines.join import join_turns_tool_calls
from condor_ray.sources.transcripts import read_transcripts, transcript_fragments


@pytest.fixture(scope="module")
def syn_stream(ray_session, tiny_fixture):
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(4096, 5, 7),
        windows=[__import__("condor_ray.windows", fromlist=["TumblingWindow"]).TumblingWindow(60_000)],
        key=KeySpec("conv_id", "java_hash"),
    )
    ds = read_transcripts(tiny_fixture)
    return build_windowed_synopses(ds, cfg, concurrency=2).to_pandas()


class TestQueryLatest:
    def test_queries_hit_latest_window(self, ray_session, tiny_fixture, syn_stream):
        queries = rd.read_parquet(f"{tiny_fixture}/queries.parquet")
        out = query_latest(queries, syn_stream, query_count_min).to_pandas()
        assert len(out) == queries.count()
        latest_start = syn_stream["window_start"].max()
        assert (out["window_start"] == latest_start).all()
        # results are CM counts of conv keys in the latest window: >= 0
        assert (out["result"] >= 0).all()

    def test_latest_matches_direct_query(self, ray_session, tiny_fixture, syn_stream):
        from condor_ray.synopses import Synopsis

        queries = rd.read_parquet(f"{tiny_fixture}/queries.parquet")
        out = query_latest(queries, syn_stream, query_count_min).to_pandas()
        latest = syn_stream.sort_values("window_start").iloc[-1]
        cm = Synopsis.from_bytes(latest["payload"])
        direct = cm.query_batch(
            out["query_key"].to_numpy().astype(np.int32)
        )
        assert (out["result"].to_numpy() == direct).all()


class TestQueryTimestamped:
    def test_asof_routing(self, ray_session, tiny_fixture, syn_stream):
        from condor_ray.synopses import Synopsis

        queries = rd.read_parquet(f"{tiny_fixture}/queries.parquet")
        out = query_timestamped(queries, syn_stream, query_count_min).to_pandas()
        # every surviving query's ts lies inside its routed window
        ts = out["query_ts"].astype("int64")
        assert ((ts >= out["window_start"]) & (ts < out["window_end"])).all()
        # spot-check one window: results equal direct sketch queries
        ws = out["window_start"].iloc[0]
        grp = out[out["window_start"] == ws]
        row = syn_stream[syn_stream["window_start"] == ws].iloc[0]
        cm = Synopsis.from_bytes(row["payload"])
        assert (
            grp["result"].to_numpy()
            == cm.query_batch(grp["query_key"].to_numpy().astype(np.int32))
        ).all()

    def test_out_of_range_queries_dropped(self, ray_session, syn_stream):
        q = pd.DataFrame(
            {
                "query_key": np.asarray([1, 2], dtype=np.int32),
                "query_ts": pd.to_datetime([0, 10**15], unit="us"),
            }
        )
        out = query_timestamped(rd.from_pandas(q), syn_stream, query_count_min).to_pandas()
        assert len(out) == 0

    def test_output_columns_overwritten_not_duplicated(self, ray_session, syn_stream):
        """Chaining one evaluator's output as another's query stream must
        REPLACE result/window_start/window_end (old pandas semantics), not
        append duplicate column names."""
        q = pd.DataFrame(
            {
                "query_key": np.asarray([1, 2, 3], dtype=np.int32),
                "result": np.zeros(3),        # stale columns from a prior
                "window_start": np.zeros(3),  # evaluator pass
            }
        )
        out = query_latest(rd.from_pandas(q), syn_stream, query_count_min).to_pandas()
        assert sorted(out.columns) == sorted(
            ["query_key", "result", "window_start", "window_end"]
        )
        assert (out["window_start"] == syn_stream["window_start"].max()).all()

        q["query_ts"] = pd.to_datetime(
            [syn_stream["window_start"].min()] * 3, unit="us"
        ).astype("datetime64[us]")
        out = query_timestamped(
            rd.from_pandas(q), syn_stream, query_count_min
        ).to_pandas()
        assert out.columns.is_unique
        assert (out["window_start"] == syn_stream["window_start"].min()).all()


class TestQueryLatestStratified:
    def test_per_stratum(self, ray_session, tiny_fixture):
        from condor_ray.windows import TumblingWindow

        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(2048, 3, 7),
            windows=[TumblingWindow(60_000)],
            key=KeySpec("conv_id", "java_hash"),
            stratify_by="role",
        )
        ds = read_transcripts(tiny_fixture)
        syn = build_windowed_synopses(ds, cfg, concurrency=2).to_pandas()
        queries = rd.read_parquet(f"{tiny_fixture}/queries.parquet")
        out = query_latest_stratified(queries, syn, query_count_min).to_pandas()
        assert set(out["stratum"].unique()) <= {"user", "assistant", "tool"}
        assert len(out) > 0
        # null-stratum queries are dropped
        q_pd = pq.read_table(f"{tiny_fixture}/queries.parquet").to_pandas()
        assert len(out) == q_pd["stratum"].notna().sum()


class TestStreamStreamJoin:
    def test_join_fixture_semantics(self, ray_session, tiny_fixture):
        turns = read_transcripts(tiny_fixture)
        calls = rd.read_parquet(f"{tiny_fixture}/tool_calls.parquet")
        out = join_turns_tool_calls(turns, calls, bound_ms=5_000).to_pandas()

        # pandas oracle
        t = pd.concat(
            [pq.read_table(f).to_pandas() for f in transcript_fragments(tiny_fixture)]
        )
        t = t[t["tool"].notna()]
        c = pq.read_table(f"{tiny_fixture}/tool_calls.parquet").to_pandas()
        m = t.merge(c, on=["conv_id", "tool"], suffixes=("_t", "_c"))
        ts_t = m["ts_t"].astype("int64")
        ts_c = m["ts_c"].astype("int64")
        expected = m[(ts_c >= ts_t) & (ts_c <= ts_t + 5_000_000)]
        assert len(out) == len(expected)

        # orphan conv_ids never appear
        assert not out["conv_id"].str.startswith("orphan").any()
        # duplicates in the call stream produce duplicate join rows
        dup_counts = c.groupby("call_id").size()
        assert (dup_counts > 1).any()


class TestStreamingJoin:
    def test_streaming_matches_batch_join(self, ray_session, tiny_fixture, tmp_path):
        """The streaming join (actors + watermark purge) emits exactly the
        batch join's pairs, each exactly once."""
        import pyarrow.parquet as pq_
        import pyarrow as pa_
        import numpy as np_

        from condor_ray.engine.streaming_join import StreamingJoinJob

        # split tool_calls into ts-ordered fragments (arrival stream)
        calls = pq_.read_table(f"{tiny_fixture}/tool_calls.parquet")
        order = pa_.compute.sort_indices(calls, sort_keys=[("ts", "ascending"), ("call_id", "ascending")])
        calls = calls.take(order)
        call_dir = tmp_path / "call_frags"
        call_dir.mkdir()
        bounds = np_.linspace(0, calls.num_rows, 7).astype(int)
        call_frags = []
        for i in range(6):
            p = str(call_dir / f"calls-{i:05d}.parquet")
            pq_.write_table(calls.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
            call_frags.append(p)

        turn_frags = transcript_fragments(tiny_fixture)
        job = StreamingJoinJob(parallelism=3, bound_ms=5_000, out_dir=str(tmp_path / "jout"))
        summary = job.run(turn_frags, call_frags)
        got = job.result_dataset().to_pandas()
        job.shutdown()

        # oracle: batch join restricted to NON-LATE rows under the same
        # two-input watermark replay (late rows drop in streaming mode)
        wm = {"turn": -(2**62), "call": -(2**62)}
        keep_turn, keep_call = [], []
        sched = []
        for i in range(max(len(turn_frags), len(call_frags))):
            if i < len(turn_frags):
                sched.append(("turn", turn_frags[i]))
            if i < len(call_frags):
                sched.append(("call", call_frags[i]))
        for side, p in sched:
            df = pq_.read_table(p).to_pandas()
            ts = df["ts"].astype("int64")
            combined = min(wm.values())
            if side == "turn":
                keep_turn.append(df[ts + 5_000_000 >= combined])
            else:
                keep_call.append(df[ts >= combined])
            wm[side] = max(wm[side], int(ts.max()))
        turns = rd.from_pandas(pd.concat(keep_turn, ignore_index=True))
        calls_ds = rd.from_pandas(pd.concat(keep_call, ignore_index=True))
        expected = join_turns_tool_calls(turns, calls_ds, bound_ms=5_000).to_pandas()

        key = ["conv_id", "turn_idx", "call_id", "call_ts"]
        g = got.sort_values(key).reset_index(drop=True)
        e = expected.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e) == summary["matches"]
        assert g.duplicated(key).sum() == e.duplicated(key).sum()
        for c in key + ["tool", "status", "turn_ts"]:
            assert (g[c].to_numpy() == e[c].to_numpy()).all()

    def test_buffers_purge(self, ray_session, tiny_fixture, tmp_path):
        from condor_ray.engine.streaming_join import StreamingJoinJob

        turn_frags = transcript_fragments(tiny_fixture)
        job = StreamingJoinJob(parallelism=2, bound_ms=5_000, out_dir=str(tmp_path / "purge"))
        # run only turns (no calls): with a watermark stuck at -inf nothing
        # emits and nothing purges until the end-of-stream flush
        job.run(turn_frags, [])
        import ray as ray_
        buffered = ray_.get([s.buffered.remote() for s in job.stores])
        # flush purged everything behind the final horizon
        assert sum(b["turns"] for b in buffered) == 0
        job.shutdown()

    def test_out_of_order_calls_dropped_late_no_lost_pairs(
        self, ray_session, tiny_fixture, tmp_path
    ):
        """Calls arriving behind the combined watermark are dropped as late
        (counted) rather than silently losing their pairs."""
        import pyarrow.parquet as pq_
        import pyarrow as pa_
        import numpy as np_

        from condor_ray.engine.streaming_join import StreamingJoinJob

        calls = pq_.read_table(f"{tiny_fixture}/tool_calls.parquet")
        # REVERSE ts order: almost every call arrives behind the watermark
        order = pa_.compute.sort_indices(
            calls, sort_keys=[("ts", "descending"), ("call_id", "ascending")]
        )
        calls = calls.take(order)
        call_dir = tmp_path / "rev_calls"
        call_dir.mkdir()
        bounds = np_.linspace(0, calls.num_rows, 4).astype(int)
        cf = []
        for i in range(3):
            p = str(call_dir / f"c{i}.parquet")
            pq_.write_table(calls.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
            cf.append(p)
        job = StreamingJoinJob(parallelism=2, bound_ms=5_000, out_dir=str(tmp_path / "rev_out"))
        s = job.run(transcript_fragments(tiny_fixture), cf)
        got = job.result_dataset().to_pandas() if s["matches"] else pd.DataFrame()
        job.shutdown()
        assert s["late_dropped"] > 0
        # every emitted pair satisfies the join predicate (no corruption)
        if len(got):
            assert (
                (got["call_ts"] >= got["turn_ts"])
                & (got["call_ts"] <= got["turn_ts"] + 5_000_000)
            ).all()
            # duplicates may only come from duplicated source calls (the F2
            # fixture has ~5% duplicate call rows)
            call_mult = (
                pq_.read_table(f"{tiny_fixture}/tool_calls.parquet")
                .to_pandas()
                .groupby(["call_id", "ts"])
                .size()
            )
            pair_mult = got.groupby(["conv_id", "turn_idx", "call_id", "call_ts"]).size()
            assert pair_mult.max() <= call_mult.max()


class TestEvaluatorEdgeCases:
    def test_boundary_ts_answered_inclusive_end(self, ray_session, syn_stream):
        """The reference answers when windowEnd >= ts
        (QueryTimestampedFunction.java:57): a query at EXACTLY the last
        window's end routes to that window instead of being dropped."""
        last = syn_stream.sort_values("window_start").iloc[-1]
        q = pd.DataFrame(
            {
                "query_key": np.asarray([1], dtype=np.int32),
                "query_ts": pd.to_datetime(
                    [int(last["window_end"])], unit="us"
                ).astype("datetime64[us]"),
            }
        )
        out = query_timestamped(
            rd.from_pandas(q), syn_stream, query_count_min
        ).to_pandas()
        assert len(out) == 1
        assert out["window_start"].iloc[0] == last["window_start"]
        # one past the end is still dropped
        q["query_ts"] = pd.to_datetime(
            [int(last["window_end"]) + 1], unit="us"
        ).astype("datetime64[us]")
        out = query_timestamped(
            rd.from_pandas(q), syn_stream, query_count_min
        ).to_pandas()
        assert len(out) == 0

    def test_empty_synopsis_stream_returns_empty_result(
        self, ray_session, syn_stream
    ):
        """An all-late/empty stream emits no synopses; the evaluators must
        return the empty typed result (reference buffers forever), not
        crash on the missing archive."""
        empty = syn_stream.iloc[0:0]
        q = pd.DataFrame(
            {
                "query_key": np.asarray([1, 2], dtype=np.int32),
                "query_ts": pd.to_datetime([0, 1], unit="us").astype(
                    "datetime64[us]"
                ),
            }
        )
        for fn in (query_latest, query_timestamped):
            ds = fn(rd.from_pandas(q), empty, query_count_min)
            assert {"result", "window_start", "window_end"} <= set(
                ds.schema().names
            )
            assert len(ds.to_pandas()) == 0


class TestStreamingJoinEmptyResult:
    def test_zero_matches_returns_empty_typed_frame(self, ray_session, tmp_path):
        """A stream where no pair satisfies the bound writes no emission
        files; result_dataset() must return the empty typed frame instead
        of crashing on read_parquet([])."""
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from condor_ray.engine.streaming_join import StreamingJoinJob

        ts0 = 1_000_000_000
        turns = pa.table(
            {
                "conv_id": pa.array(["c1", "c2"]),
                "turn_idx": pa.array([0, 0], type=pa.int32()),
                "role": pa.array(["assistant", "assistant"]),
                "tool": pa.array(["tool_a", "tool_b"]),
                "ts": pa.array([ts0, ts0 + 10], type=pa.timestamp("us")),
            }
        )
        # calls far outside the 1 ms bound -> zero matches
        calls = pa.table(
            {
                "conv_id": pa.array(["c1", "c2"]),
                "call_id": pa.array(["k1", "k2"]),
                "tool": pa.array(["tool_a", "tool_b"]),
                "status": pa.array(["ok", "ok"]),
                "ts": pa.array(
                    [ts0 + 10_000_000, ts0 + 10_000_000], type=pa.timestamp("us")
                ),
            }
        )
        tdir, cdir = tmp_path / "t", tmp_path / "c"
        tdir.mkdir(), cdir.mkdir()
        pq_.write_table(turns, str(tdir / "t-00000.parquet"))
        pq_.write_table(calls, str(cdir / "c-00000.parquet"))
        job = StreamingJoinJob(
            parallelism=2, bound_ms=1, out_dir=str(tmp_path / "empty_out")
        )
        summary = job.run(
            [str(tdir / "t-00000.parquet")], [str(cdir / "c-00000.parquet")]
        )
        res = job.result_dataset()
        names = res.schema().names
        got = res.to_pandas()
        job.shutdown()
        assert summary["matches"] == 0
        assert len(got) == 0
        # Ray's to_pandas drops columns for 0-row datasets; the schema is
        # the stable surface for the typed empty result
        assert names == [
            "conv_id", "turn_idx", "turn_ts", "call_id", "tool", "status",
            "call_ts",
        ]


def _cm_payload(count: int) -> bytes:
    """CM sketch payload containing key 1 `count` times."""
    from condor_ray.synopses.registry import make_synopsis

    s = make_synopsis("CountMinSketch", (1024, 3, 7))
    s.update_batch(np.full(count, 1, dtype=np.int32))
    return s.to_bytes()


class TestQueryTimestampedStratified:
    def _syn_frame(self, n_windows: int, strata=("A", "B")) -> pd.DataFrame:
        rows = []
        for s in strata:
            for w in range(n_windows):
                rows.append(
                    {
                        "stratum": s,
                        "window_start": w * 1000,
                        "window_end": (w + 1) * 1000,
                        # distinct count per (stratum, window) so routing
                        # mistakes are visible in the result value
                        "payload": _cm_payload(
                            (w + 1) * (10 if s == "A" else 1)
                        ),
                    }
                )
        return pd.DataFrame(rows)

    def test_routing_and_chunked_broadcast(self, ray_session, monkeypatch):
        """Results are identical whether the archive ships as one chunk or
        many (the chunked-broadcast path must not change routing)."""
        import condor_ray.evaluate.queries as q

        from condor_ray.evaluate.queries import (
            query_count_min,
            query_timestamped_stratified,
        )

        syn = self._syn_frame(8)
        queries = pd.DataFrame(
            {
                "query_key": np.full(16, 1, dtype=np.int64),
                "query_ts": pd.to_datetime(
                    np.tile(np.arange(8) * 1000 + 500, 2), unit="us"
                ),
                "stratum": ["A"] * 8 + ["B"] * 8,
            }
        )
        expected_a = (np.arange(8) + 1) * 10
        expected_b = np.arange(8) + 1

        for chunk in (10_000, 3):  # single-chunk vs multi-chunk broadcast
            monkeypatch.setattr(q, "_ARCHIVE_CHUNK", chunk)
            out = (
                query_timestamped_stratified(
                    rd.from_pandas(queries), syn, query_count_min
                )
                .to_pandas()
                .sort_values(["stratum", "window_start"])
            )
            assert len(out) == 16
            a = out[out["stratum"] == "A"]["result"].to_numpy()
            b = out[out["stratum"] == "B"]["result"].to_numpy()
            assert (a == expected_a).all(), chunk
            assert (b == expected_b).all(), chunk

    def test_per_stratum_archive_bound(self, ray_session):
        """max_synopsis_count keeps only the newest N windows PER STRATUM
        (the reference's per-stratum TreeSet bound): queries routed to an
        evicted window are dropped, newest-window queries still answer."""
        from condor_ray.evaluate.queries import (
            query_count_min,
            query_timestamped_stratified,
        )

        syn = self._syn_frame(4)
        queries = pd.DataFrame(
            {
                "query_key": np.full(8, 1, dtype=np.int64),
                "query_ts": pd.to_datetime(
                    np.tile(np.arange(4) * 1000 + 500, 2), unit="us"
                ),
                "stratum": ["A"] * 4 + ["B"] * 4,
            }
        )
        out = query_timestamped_stratified(
            rd.from_pandas(queries), syn, query_count_min, max_synopsis_count=1
        ).to_pandas()
        # only the newest window (start=3000) survives per stratum
        assert len(out) == 2
        assert (out["window_start"] == 3000).all()
        assert sorted(out["stratum"]) == ["A", "B"]
        assert sorted(out["result"]) == [4, 40]


class TestStratifiedLatestNonStringStrata:
    def test_int_strata_answer_after_first_flush(self, tmp_path):
        """_arrive must normalize the stratum BEFORE the membership test:
        emit tables store strata as strings, so an int-keyed query group
        would buffer forever once the one-time first flush passed."""
        from condor_ray.evaluate.continuous import (
            ContinuousQueryLatestStratified,
        )
        from condor_ray.evaluate.queries import query_count_min

        class _DummyJob:
            out_dir = str(tmp_path)

        ev = ContinuousQueryLatestStratified(_DummyJob(), query_count_min)
        # state as _refresh_latest builds it: string-keyed
        ev.latest["7"] = (_cm_payload(5), 0, 1000)
        ev._arrive(
            0,
            pd.DataFrame(
                {"query_key": np.asarray([1], dtype=np.int64), "stratum": [7]}
            ),
        )
        assert not ev.buffered, "int stratum was buffered instead of answered"
        assert len(ev.results) == 1
        assert (ev.results[0]["result"] == 5).all()
