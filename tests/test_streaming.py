"""Streaming driver: watermark/late-drop semantics, partition-count
invariance, exactly-once resume, hot-key salting."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from condor_ray.config import BuildConfiguration, KeySpec
from condor_ray.engine.streaming import StreamingSynopsisJob
from condor_ray.hashing import java_string_hash_array
from condor_ray.sources.transcripts import transcript_fragments
from condor_ray.synopses import CountMinSketch, Synopsis
from condor_ray.windows import SlidingWindow, TumblingWindow

W_MS = 10_000  # 10 s tumbling (20 s late arrivals cross slice boundaries)
W_US = W_MS * 1000


def oracle_stream(fragments, slice_us):
    """Sequential replay oracle: per-fragment watermark, late-slice drops."""
    wm = -(2**62)
    kept = []
    n_late = 0
    for f in fragments:
        df = pq.read_table(f).to_pandas()
        ts = df["ts"].astype("int64").to_numpy()
        late = (ts // slice_us + 1) * slice_us <= wm
        n_late += int(late.sum())
        kept.append(df[~late])
        wm = max(wm, int(ts.max()))
    return pd.concat(kept, ignore_index=True), n_late


@pytest.fixture(scope="module")
def stream_result(ray_session, tiny_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(512, 3, 7),
        windows=[TumblingWindow(W_MS)],
        key=KeySpec("conv_id", "java_hash"),
        parallelism=3,
    )
    job = StreamingSynopsisJob(cfg, out)
    frags = transcript_fragments(tiny_fixture)
    summary = job.run(frags)
    result = job.result_dataset().to_pandas()
    job.shutdown()
    return summary, result, frags


class TestStreamingSemantics:
    def test_late_rows_dropped_and_counted(self, stream_result):
        summary, result, frags = stream_result
        kept, n_late = oracle_stream(frags, W_US)
        assert summary["late_dropped"] == n_late
        assert n_late > 0  # the fixture has 10% late arrivals
        assert summary["rows"] == sum(pq.read_metadata(f).num_rows for f in frags)

    def test_window_counts_match_oracle(self, stream_result):
        _, result, frags = stream_result
        kept, _ = oracle_stream(frags, W_US)
        ts = kept["ts"].astype("int64")
        expected = (ts // W_US).value_counts().sort_index()
        got = result.set_index(result["window_start"] // W_US)["n_rows"].sort_index()
        assert (got == expected).all()

    def test_synopsis_state_parity(self, stream_result):
        _, result, frags = stream_result
        kept, _ = oracle_stream(frags, W_US)
        ts = kept["ts"].astype("int64").to_numpy()
        keys = java_string_hash_array(kept["conv_id"].tolist())
        wids = ts // W_US
        for wid in np.unique(wids)[:10]:
            oracle = CountMinSketch(512, 3, 7)
            oracle.update_batch(keys[wids == wid])
            row = result[result["window_start"] == wid * W_US]
            assert len(row) == 1
            got = Synopsis.from_bytes(row["payload"].iloc[0])
            assert (got.array == oracle.array).all()

    def test_each_window_emitted_once(self, stream_result):
        _, result, _ = stream_result
        assert result.duplicated(["window_kind", "window_start", "stratum"]).sum() == 0


class TestPartitionInvariance:
    def test_parallelism_does_not_change_output(self, ray_session, tiny_fixture, tmp_path):
        frags = transcript_fragments(tiny_fixture)
        outs = []
        for p in (1, 5):
            out = str(tmp_path / f"out_p{p}")
            cfg = BuildConfiguration(
                synopsis="CountMinSketch",
                params=(256, 3, 7),
                windows=[TumblingWindow(W_MS)],
                key=KeySpec("conv_id", "java_hash"),
                parallelism=p,
            )
            job = StreamingSynopsisJob(cfg, out)
            job.run(frags)
            df = job.result_dataset().to_pandas().sort_values("window_start")
            job.shutdown()
            outs.append(df.reset_index(drop=True))
        a, b = outs
        assert (a["n_rows"] == b["n_rows"]).all()
        for pa_, pb_ in zip(a["payload"], b["payload"]):
            sa, sb = Synopsis.from_bytes(pa_), Synopsis.from_bytes(pb_)
            assert (sa.array == sb.array).all()

    def test_hot_key_salting_preserves_output(self, ray_session, tiny_fixture, tmp_path):
        frags = transcript_fragments(tiny_fixture)
        outs = []
        for thresh in (None, 5):
            out = str(tmp_path / f"out_salt_{thresh}")
            cfg = BuildConfiguration(
                synopsis="CountMinSketch",
                params=(256, 3, 7),
                windows=[TumblingWindow(W_MS)],
                key=KeySpec("conv_id", "java_hash"),
                parallelism=4,
                hot_key_threshold=thresh,
            )
            job = StreamingSynopsisJob(cfg, out)
            job.run(frags)
            df = job.result_dataset().to_pandas().sort_values("window_start")
            job.shutdown()
            outs.append(df.reset_index(drop=True))
        a, b = outs
        assert (a["n_rows"] == b["n_rows"]).all()
        for pa_, pb_ in zip(a["payload"], b["payload"]):
            assert (
                Synopsis.from_bytes(pa_).array == Synopsis.from_bytes(pb_).array
            ).all()


class TestExactlyOnceResume:
    def test_crash_resume_identical_output(self, ray_session, tiny_fixture, tmp_path):
        frags = transcript_fragments(tiny_fixture)

        def make_cfg():
            return BuildConfiguration(
                synopsis="CountMinSketch",
                params=(256, 3, 7),
                windows=[TumblingWindow(W_MS)],
                key=KeySpec("conv_id", "java_hash"),
                parallelism=2,
            )

        # reference run (no interruption)
        ref_out = str(tmp_path / "ref")
        job = StreamingSynopsisJob(make_cfg(), ref_out)
        job.run(frags)
        ref = job.result_dataset().to_pandas().sort_values("window_start").reset_index(drop=True)
        job.shutdown()

        # crashed run: process only the first 3 fragments with checkpointing
        out = str(tmp_path / "crashy")
        ckpt = str(tmp_path / "ckpt")
        job1 = StreamingSynopsisJob(make_cfg(), out, checkpoint_dir=ckpt, checkpoint_every=1)
        job1.run(frags[:3], final_flush=False)  # "crash" after 3 fragments
        job1.shutdown()
        job2 = StreamingSynopsisJob(make_cfg(), out, checkpoint_dir=ckpt, checkpoint_every=1)
        assert job2.resume()
        # resume points at the checkpoint written after fragment 3
        assert job2.next_fragment == 3
        job2.run(frags, resume=False)  # continues from restored cursor
        got = job2.result_dataset().to_pandas().sort_values("window_start").reset_index(drop=True)
        job2.shutdown()

        assert (got["n_rows"].to_numpy() == ref["n_rows"].to_numpy()).all()
        assert (got["window_start"].to_numpy() == ref["window_start"].to_numpy()).all()
        for pa_, pb_ in zip(got["payload"], ref["payload"]):
            assert (
                Synopsis.from_bytes(pa_).array == Synopsis.from_bytes(pb_).array
            ).all()

    def test_manifest_lineage(self, ray_session, tiny_fixture, tmp_path):
        import json

        frags = transcript_fragments(tiny_fixture)
        out = str(tmp_path / "mani")
        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(128, 3, 7),
            windows=[TumblingWindow(W_MS)],
            parallelism=2,
        )
        job = StreamingSynopsisJob(cfg, out)
        job.run(frags)
        job.shutdown()
        lines = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
        frag_lines = [l for l in lines if "fragment" in l]
        assert [l["fragment"] for l in frag_lines] == list(range(len(frags)))
        assert all(l["watermark"] > 0 for l in frag_lines)
        wm = [l["watermark"] for l in frag_lines]
        assert wm == sorted(wm)  # watermark monotone
        summary = [l for l in lines if l.get("summary")]
        assert summary and summary[-1]["windows_emitted"] > 0


class TestFragmentationInvariance:
    """With ts-ordered input (no late data), the emitted synopsis stream
    must not depend on micro-batch boundaries: watermarks advance at
    different points but every window still closes over the same rows.
    (With late data the reference's max-ts watermark makes drops depend on
    batching granularity — covered by the late-drop oracle test above.)"""

    def _emitted_state(self, frag_paths, tmp_path, tag):
        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(512, 3, 7),
            windows=[TumblingWindow(W_MS)],
            key=KeySpec("conv_id", "java_hash"),
            parallelism=2,
        )
        job = StreamingSynopsisJob(cfg, str(tmp_path / tag))
        job.run(frag_paths)
        out = job.result_dataset().to_pandas()
        job.shutdown()
        return {
            int(r["window_start"]): Synopsis.from_bytes(r["payload"]).array.tobytes()
            for _, r in out.iterrows()
        }

    def test_emissions_identical_across_fragmentations(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(9)
        n = 4000
        convs = [f"c{i}" for i in rng.integers(0, 150, n)]
        ts = np.sort(rng.integers(0, 90_000, n)).astype("datetime64[ms]").astype("datetime64[us]")
        table = pa.table({"conv_id": pa.array(convs), "ts": pa.array(ts)})

        states = []
        for tag, n_frag in (("one", 1), ("seven", 7), ("thirteen", 13)):
            cuts = np.sort(rng.choice(np.arange(1, n), n_frag - 1, replace=False)) if n_frag > 1 else np.array([], dtype=int)
            bounds = np.concatenate([[0], cuts, [n]])
            d = tmp_path / f"frags_{tag}"
            d.mkdir()
            paths = []
            for i in range(len(bounds) - 1):
                p = str(d / f"frag-{i:05d}.parquet")
                pq.write_table(table.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])), p)
                paths.append(p)
            states.append(self._emitted_state(paths, tmp_path, f"out_{tag}"))

        assert states[0].keys() == states[1].keys() == states[2].keys()
        for w in states[0]:
            assert states[0][w] == states[1][w] == states[2][w], w


class TestPartitionFragmentEdgeCases:
    def test_null_conv_id_rows_do_not_crash(self, ray_session, tmp_path):
        """Null conv_id rows hash to 0 (the hashing.py convention) instead
        of turning into NaN dictionary indices that explode the partition
        lookup."""
        import pyarrow as pa

        from condor_ray.engine.streaming import _partition_fragment

        tbl = pa.table(
            {
                "conv_id": pa.array(["c1", None, "c2", None, "c1"]),
                "role": pa.array(["user"] * 5),
                "tool": pa.array([None] * 5, pa.string()),
                "text": pa.array(["x"] * 5),
                "ts": pa.array(
                    np.arange(5, dtype=np.int64) * 1_000_000
                ).cast(pa.timestamp("us")),
            }
        )
        path = str(tmp_path / "nulls.parquet")
        pq.write_table(tbl, path)
        meta, *shards = _partition_fragment(
            path, 3, 1_000_000, -(2**62), None, None, None
        )
        assert meta["n_rows"] == 5 and meta["n_late"] == 0
        assert sum(s.num_rows for s in shards) == 5
        # both null rows land in ONE partition (they share the hash-0 route)
        null_counts = [
            sum(1 for v in s["conv_id"].to_pylist() if v is None) for s in shards
        ]
        assert sorted(null_counts)[-1] == 2 and sum(null_counts) == 2
        # hot-key path tolerates the null sentinel too
        meta2, *shards2 = _partition_fragment(
            path, 3, 1_000_000, -(2**62), 1, None, None
        )
        assert sum(s.num_rows for s in shards2) == 5

    def test_close_every_respected_in_sequential_mode(
        self, ray_session, tiny_fixture, tmp_path
    ):
        """close_every must govern BOTH run modes: the sequential path
        (forced by checkpointing) emits the same files as the pipelined
        path for the same cadence."""
        frags = transcript_fragments(tiny_fixture)[:4]
        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(128, 3, 7),
            windows=[TumblingWindow(W_MS)],
            parallelism=2,
        )
        outs = {}
        for mode, pipelined in (("seq", False), ("pipe", True)):
            out = str(tmp_path / mode)
            job = StreamingSynopsisJob(cfg, out, close_every=3)
            job.run(frags, pipelined=pipelined)
            job.shutdown()
            outs[mode] = sorted(
                f for f in os.listdir(out) if f.startswith("emit-")
            )
        assert outs["seq"] == outs["pipe"]
        # cadence 3 over 4 fragments + final flush: only f00002 / f00003 /
        # final may close — f00000/f00001 must NOT have emitted
        assert not any("f00000" in f or "f00001" in f for f in outs["seq"])


class TestFlushKeepsWatermark:
    """The end-of-input flush must close with a LOCAL horizon, not by
    mutating job.watermark: a continuation run() after final_flush=True
    (the documented resume-with-more-fragments pattern) otherwise
    late-drops every row within max_span behind the true watermark."""

    @staticmethod
    def _true_max_ts_us(frags):
        return max(
            int(pq.read_table(f, columns=["ts"])["ts"].cast("int64").to_numpy().max())
            for f in frags
        )

    def test_synopsis_job(self, ray_session, tiny_fixture, tmp_path):
        frags = transcript_fragments(tiny_fixture)[:3]
        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(128, 3, 7),
            windows=[TumblingWindow(W_MS)],
            key=KeySpec("conv_id", "java_hash"),
            parallelism=2,
        )
        job = StreamingSynopsisJob(cfg, str(tmp_path / "wm"))
        job.run(frags, final_flush=True)
        try:
            assert job.watermark == self._true_max_ts_us(frags)
        finally:
            job.shutdown()

    def test_wavelet_job(self, ray_session, tiny_fixture, tmp_path):
        from condor_ray.engine.streaming_wavelets import StreamingWaveletJob

        frags = transcript_fragments(tiny_fixture)[:3]
        job = StreamingWaveletJob(
            TumblingWindow(W_MS), str(tmp_path / "wm_wave"), size=64,
            parallelism=2, key=KeySpec("turn_idx", "value"),
        )
        job.run(frags, final_flush=True)
        try:
            assert job.watermark == self._true_max_ts_us(frags)
        finally:
            job.shutdown()
