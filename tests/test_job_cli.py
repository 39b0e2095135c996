"""The ``ray job submit`` entrypoint (python -m condor_ray.job)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fragments(tmp_path_factory):
    d = tmp_path_factory.mktemp("job_frags")
    rng = np.random.default_rng(5)
    n = 5000
    for k in range(3):
        ts0 = 1_000_000 + k * n * 1000
        tbl = pa.table(
            {
                "conv_id": pa.array([f"c{int(i):04d}" for i in rng.integers(0, 200, n)]),
                "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
                "role": pa.array(
                    [["user", "assistant", "tool"][i % 3] for i in range(n)]
                ),
                "tool": pa.array(["grep" if i % 5 == 0 else None for i in range(n)]),
                "ts": pa.array(
                    (ts0 + np.arange(n, dtype=np.int64) * 1000)
                ).cast(pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"fragment-{k:05d}.parquet"))
    return str(d)


class TestJobCli:
    def test_cm_pipeline_end_to_end(self, ray_session, fragments, tmp_path):
        from condor_ray.job import main

        out = str(tmp_path / "out")
        summary = main(
            [
                "--pipeline", "cm", "--input", fragments, "--out", out,
                "--window-ms", "5000", "--parallelism", "2",
            ]
        )
        assert summary["rows"] == 15000
        emits = [f for f in os.listdir(out) if f.startswith("emit-")]
        assert emits, "no emission files written"
        assert os.path.exists(os.path.join(out, "manifest.jsonl"))
        # emissions hold windowed synopsis rows
        total = sum(
            pq.read_table(os.path.join(out, f)).num_rows for f in emits
        )
        assert total == summary["windows_emitted"] > 0

    def test_counts_pipeline_matches_pandas(self, ray_session, fragments, tmp_path):
        from condor_ray.job import main

        out = str(tmp_path / "counts")
        main(
            ["--pipeline", "counts", "--input", fragments, "--out", out,
             "--window-ms", "5000"]
        )
        got = (
            pd.concat(
                [pq.read_table(os.path.join(out, f)).to_pandas()
                 for f in os.listdir(out)]
            )
            .groupby("window_start")["n_rows"].sum()
        )
        frames = [
            pq.read_table(os.path.join(fragments, f)).to_pandas()
            for f in sorted(os.listdir(fragments))
        ]
        ts = pd.concat(frames)["ts"].astype("int64")
        want = ts.groupby((ts // 5_000_000) * 5_000_000).count()
        assert got.sort_index().tolist() == want.sort_index().tolist()

    def test_asof_pipeline_end_to_end(self, ray_session, fragments, tmp_path):
        from condor_ray.job import main

        out = str(tmp_path / "asof_out")
        summary = main(
            ["--pipeline", "asof", "--input", fragments, "--out", out]
        )
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        got = pd.concat(
            [pq.read_table(os.path.join(out, f)).to_pandas() for f in files]
        )
        assert summary["rows"] == len(got) == 3000  # every 5th row is a tool turn
        # brute-force check on one conversation
        src = pd.concat(
            pq.read_table(os.path.join(fragments, f)).to_pandas()
            for f in sorted(os.listdir(fragments))
        )
        src["ts_us"] = src["ts"].astype("int64")
        conv = got["conv_id"].iloc[0]
        mine = got[got["conv_id"] == conv]
        s = src[src["conv_id"] == conv]
        for _, row in mine.iterrows():
            cand = s[(s["role"] == "user") & (s["ts_us"] <= row["ts_us"])]
            if cand.empty:
                assert np.isnan(row["user_ts"])
            else:
                best = cand.sort_values(["ts_us", "turn_idx"]).iloc[-1]
                assert int(row["user_ts"]) == int(best["ts_us"])

    def test_missing_input_errors(self, ray_session, tmp_path):
        from condor_ray.job import main

        with pytest.raises(SystemExit):
            main(["--pipeline", "cm", "--input", str(tmp_path / "nope"),
                  "--out", str(tmp_path / "o")])

    def test_resume_wiring_continues_from_checkpoint(
        self, ray_session, fragments, tmp_path
    ):
        """--checkpoint-dir + --resume through the CLI: a first run over 2
        fragments checkpoints; the resumed run over all 3 processes ONLY the
        remaining fragment and the combined emissions equal a clean
        single-shot run byte-for-byte."""
        from condor_ray.job import main

        frags = sorted(os.listdir(fragments))
        partial = str(tmp_path / "first_two")
        os.makedirs(partial)
        for f in frags[:2]:
            os.symlink(os.path.join(fragments, f), os.path.join(partial, f))
        out1, ckpt = str(tmp_path / "o1"), str(tmp_path / "ckpt")
        # --no-final-flush: this run will be continued (a flush would
        # advance the watermark past end-of-input and the continuation's
        # rows would drop as late)
        s1 = main(
            ["--pipeline", "cm", "--input", partial, "--out", out1,
             "--window-ms", "5000", "--parallelism", "2",
             "--checkpoint-dir", ckpt, "--checkpoint-every", "1",
             "--no-final-flush"]
        )
        assert s1["rows"] == 10000
        # resumed run sees ALL fragments but skips the checkpointed prefix;
        # same out dir so emissions accumulate
        full = str(tmp_path / "all_three")
        os.makedirs(full)
        for f in frags:
            os.symlink(os.path.join(fragments, f), os.path.join(full, f))
        s2 = main(
            ["--pipeline", "cm", "--input", full, "--out", out1,
             "--window-ms", "5000", "--parallelism", "2",
             "--checkpoint-dir", ckpt, "--resume"]
        )
        # rows is CUMULATIVE across the checkpoint (restored 10000 + the one
        # remaining fragment); the lineage manifest proves the resumed run
        # processed ONLY fragment 2
        assert s2["rows"] == 15000
        with open(os.path.join(out1, "manifest.jsonl")) as f:
            recs = [json.loads(l) for l in f if '"fragment"' in l]
        assert [r["fragment"] for r in recs] == [0, 1, 2]  # no reprocessing

        # oracle: a clean single-shot run over all 3 fragments
        out2 = str(tmp_path / "o2")
        main(
            ["--pipeline", "cm", "--input", full, "--out", out2,
             "--window-ms", "5000", "--parallelism", "2"]
        )

        def emissions(d):
            import pandas as pd

            frames = [
                pq.read_table(os.path.join(d, f)).to_pandas()
                for f in sorted(os.listdir(d))
                if f.startswith("emit-")
            ]
            return (
                pd.concat(frames)
                .sort_values(["window_start", "window_end"])
                .reset_index(drop=True)
            )

        a, b = emissions(out1), emissions(out2)
        assert len(a) == len(b)
        assert (a["window_start"] == b["window_start"]).all()
        assert all(x == y for x, y in zip(a["payload"], b["payload"]))


class TestCliFlagHygiene:
    def test_non_default_key_runs(self, ray_session, fragments, tmp_path):
        """--key tool: the splitter partitions on conv_id, so the read must
        carry conv_id alongside the key column (regression: KeyError in the
        first split task)."""
        from condor_ray.job import main

        out = str(tmp_path / "key_tool")
        summary = main(
            ["--pipeline", "cm", "--input", fragments, "--out", out,
             "--window-ms", "5000", "--parallelism", "2", "--key", "tool"]
        )
        assert summary["rows"] == 15000
        assert summary["windows_emitted"] > 0

    def test_zero_window_rejected(self, fragments, tmp_path):
        """--window-ms 0 must error (int64 // 0 only warns in numpy, so a
        zero-width window would silently swallow every row)."""
        from condor_ray.job import main

        with pytest.raises(SystemExit):
            main(
                ["--pipeline", "cm", "--input", fragments,
                 "--out", str(tmp_path / "x"), "--window-ms", "0"]
            )

    def test_zero_slide_rejected(self, fragments, tmp_path):
        """--slide-ms 0 must error, not silently build a tumbling window
        (the window constructor's falsy-zero check would pick tumbling)."""
        from condor_ray.job import main

        with pytest.raises(SystemExit):
            main(
                ["--pipeline", "cm", "--input", fragments,
                 "--out", str(tmp_path / "x"), "--window-ms", "5000",
                 "--slide-ms", "0"]
            )


class TestCleanPipeline:
    def test_clean_end_to_end_with_benchmark(self, ray_session, tmp_path):
        """--pipeline clean: docs parquet -> cleaned parquet; the benchmark
        parquet drives the decontamination gate; rows_kept counted from the
        written footers (no plan re-execution)."""
        from condor_ray.job import main
        from condor_ray.pipelines.clean import clean_corpus

        rng = np.random.default_rng(11)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = [
            " ".join(rng.choice(words, 20)) + "."
            for _ in range(300)
        ]
        texts[5] = texts[0]  # exact dup -> dedup stage drops one
        docs = pd.DataFrame(
            {"doc_id": np.arange(300, dtype=np.int64), "text": texts}
        )
        docs_p = tmp_path / "docs.parquet"
        docs.to_parquet(docs_p)
        bench = pd.DataFrame({"text": [texts[7]]})  # contaminates doc 7
        bench_p = tmp_path / "bench.parquet"
        bench.to_parquet(bench_p)

        out = str(tmp_path / "clean_out")
        summary = main(
            ["--pipeline", "clean", "--input", str(docs_p),
             "--benchmark", str(bench_p), "--out", out]
        )
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        got = pd.concat(
            [pq.read_table(os.path.join(out, f)).to_pandas() for f in files]
        )
        assert summary["rows_kept"] == len(got)
        import ray.data as rd

        want = (
            clean_corpus(rd.from_pandas(docs), bench)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True), want
        )
        ids = set(got["doc_id"])
        assert 7 not in ids  # decontaminated
        assert 5 not in ids and 0 in ids  # dedup keeps the min doc_id

    def test_benchmark_flag_rejected_elsewhere(self, tmp_path):
        from condor_ray.job import main

        with pytest.raises(SystemExit):
            main(["--pipeline", "cm", "--input", str(tmp_path),
                  "--out", str(tmp_path / "o"), "--benchmark", str(tmp_path)])

    def test_window_ms_rejected_for_clean(self, tmp_path):
        from condor_ray.job import main

        with pytest.raises(SystemExit):
            main(["--pipeline", "clean", "--input", str(tmp_path),
                  "--out", str(tmp_path / "o"), "--window-ms", "1000"])
