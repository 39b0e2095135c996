"""Streaming as-of join: parity vs the batch asof_join on a ts-ordered
stream; incremental emission; bounded build-side state; late drops."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def asof_fragments(tmp_path_factory):
    rng = np.random.default_rng(21)
    n = 9_000
    ts = np.sort(rng.integers(0, 90_000_000, n))
    roles = np.array(["user", "assistant", "tool"])[rng.integers(0, 3, n)]
    df = pd.DataFrame(
        {
            "conv_id": np.array([f"c{int(x)}" for x in rng.integers(0, 60, n)]),
            "turn_idx": rng.integers(0, 500, n).astype(np.int32),
            "role": roles,
            "tool": np.where(roles == "tool", "grep", None),
            "ts": ts,
        }
    )
    d = tmp_path_factory.mktemp("asof_frags")
    paths = []
    bounds = np.linspace(0, n, 8).astype(int)
    for i in range(7):
        t = pa.Table.from_pandas(df.iloc[bounds[i] : bounds[i + 1]], preserve_index=False)
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
        )
        p = str(d / f"fragment-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, df


def _batch_expected(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    tools = df[df["tool"].notna()]
    users = df[df["role"] == "user"]
    for _, t in tools.iterrows():
        cand = users[(users["conv_id"] == t["conv_id"]) & (users["ts"] <= t["ts"])]
        if cand.empty:
            u_ts, u_turn = -1, -1
        else:
            best = cand.sort_values(["ts", "turn_idx"]).iloc[-1]
            u_ts, u_turn = int(best["ts"]), int(best["turn_idx"])
        rows.append((t["conv_id"], int(t["ts"]), int(t["turn_idx"]), u_ts, u_turn))
    return (
        pd.DataFrame(rows, columns=["conv_id", "ts_us", "turn_idx", "user_ts", "user_turn"])
        .sort_values(["conv_id", "ts_us", "turn_idx"])
        .reset_index(drop=True)
    )


class TestStreamingAsof:
    def test_matches_batch_semantics(self, ray_session, asof_fragments, tmp_path):
        from condor_ray.engine.streaming_asof import StreamingAsofJob

        paths, df = asof_fragments
        job = StreamingAsofJob(parallelism=3, out_dir=str(tmp_path / "out"))
        summary = job.run(paths)
        got = (
            job.result_dataset()
            .to_pandas()
            .sort_values(["conv_id", "ts_us", "turn_idx"])
            .reset_index(drop=True)
        )
        job.shutdown()
        want = _batch_expected(df)
        assert summary["late_dropped"] == 0
        assert len(got) == len(want)
        for c in want.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            assert (a == b).all(), c

    def test_incremental_emission_and_bounded_state(
        self, ray_session, asof_fragments, tmp_path
    ):
        from condor_ray.engine.streaming_asof import StreamingAsofJob

        paths, df = asof_fragments
        out = str(tmp_path / "inc")
        job = StreamingAsofJob(parallelism=2, out_dir=out)
        summary = job.run(paths)
        files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
        # emissions spread over multiple cycles, not one end-of-stream dump
        sizes = [pq.read_table(os.path.join(out, f)).num_rows for f in files]
        assert len([s for s in sizes if s]) >= 3
        # bounded state: high-water mark far below the stream length
        assert summary["max_buffered_rows"] < len(df)
        n_convs = df["conv_id"].nunique()
        frag_rows = len(df) // 7
        assert summary["max_buffered_rows"] <= 4 * frag_rows + 2 * n_convs
        job.shutdown()

    def test_late_rows_dropped_and_counted(self, ray_session, tmp_path):
        from condor_ray.engine.streaming_asof import StreamingAsofJob

        d = tmp_path / "late_frags"
        d.mkdir()
        mk = lambda rows: pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
                "role": pa.array([r[2] for r in rows]),
                "tool": pa.array([r[3] for r in rows]),
                "ts": pa.array([r[4] for r in rows], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )
        pq.write_table(
            mk([("a", 0, "user", None, 1000), ("a", 1, "tool", "grep", 2000)]),
            str(d / "f0.parquet"),
        )
        # second fragment carries a LATE user row (ts behind the watermark)
        pq.write_table(
            mk([("a", 2, "user", None, 500), ("a", 3, "tool", "grep", 5000)]),
            str(d / "f1.parquet"),
        )
        job = StreamingAsofJob(parallelism=2, out_dir=str(tmp_path / "late_out"))
        summary = job.run([str(d / "f0.parquet"), str(d / "f1.parquet")])
        got = job.result_dataset().to_pandas().sort_values("ts_us")
        job.shutdown()
        assert summary["late_dropped"] == 1
        # both tool turns matched the on-time user turn at ts=1000
        assert got["user_ts"].tolist() == [1000, 1000]


def _expected_directional(df: pd.DataFrame, direction: str, tol: int) -> pd.DataFrame:
    """Brute-force as-of with direction + tolerance (matches the batch
    operator's documented tie-breaks)."""
    rows = []
    tools = df[df["tool"].notna()]
    users = df[df["role"] == "user"]
    for _, t in tools.iterrows():
        cu = users[users["conv_id"] == t["conv_id"]]
        if direction == "forward":
            cand = cu[(cu["ts"] >= t["ts"]) & (cu["ts"] <= t["ts"] + tol)]
            pick = cand.sort_values(["ts", "turn_idx"]).head(1)
        else:
            cand = cu[(cu["ts"] <= t["ts"]) & (cu["ts"] >= t["ts"] - tol)]
            pick = cand.sort_values(["ts", "turn_idx"]).tail(1)
        if pick.empty:
            u_ts, u_turn = -1, -1
        else:
            u_ts, u_turn = int(pick["ts"].iloc[0]), int(pick["turn_idx"].iloc[0])
        rows.append((t["conv_id"], int(t["ts"]), int(t["turn_idx"]), u_ts, u_turn))
    return (
        pd.DataFrame(rows, columns=["conv_id", "ts_us", "turn_idx", "user_ts", "user_turn"])
        .sort_values(["conv_id", "ts_us", "turn_idx"])
        .reset_index(drop=True)
    )


class TestStreamingAsofDirections:
    TOL = 5_000_000  # 5 s

    def _run(self, paths, tmp_path, direction, tol, tag):
        from condor_ray.engine.streaming_asof import StreamingAsofJob

        job = StreamingAsofJob(
            parallelism=3,
            out_dir=str(tmp_path / tag),
            direction=direction,
            tolerance_us=tol,
        )
        summary = job.run(paths)
        got = (
            job.result_dataset()
            .to_pandas()
            .sort_values(["conv_id", "ts_us", "turn_idx"])
            .reset_index(drop=True)
        )
        job.shutdown()
        return got, summary

    @pytest.mark.parametrize("direction", ["forward", "backward"])
    def test_direction_with_tolerance_matches_brute_force_and_batch(
        self, ray_session, asof_fragments, tmp_path, direction
    ):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        paths, df = asof_fragments
        got, summary = self._run(paths, tmp_path, direction, self.TOL, direction)
        want = _expected_directional(df, direction, self.TOL)
        assert summary["late_dropped"] == 0
        assert len(got) == len(want)
        for c in want.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

        # three-way: the batch asof_join with the same params agrees
        src = pa.Table.from_pandas(df, preserve_index=False)
        src = src.set_column(
            src.schema.get_field_index("ts"), "ts", src["ts"].cast(pa.timestamp("us"))
        )
        full = rd.from_arrow(src)
        import pyarrow.compute as pc

        batch = asof_join(
            full.map_batches(
                lambda b: b.filter(pc.is_valid(b["tool"])), batch_format="pyarrow"
            ),
            full.map_batches(
                lambda b: b.filter(pc.equal(b["role"], "user")), batch_format="pyarrow"
            ),
            left_cols={"turn_idx": "turn_idx"},
            right_cols={"user_ts": "ts", "user_turn": "turn_idx"},
            right_order=("user_turn",),
            tolerance_us=self.TOL,
            direction=direction,
        ).to_pandas()
        batch["user_ts"] = batch["user_ts"].fillna(-1).astype(np.int64)
        batch["user_turn"] = batch["user_turn"].fillna(-1).astype(np.int64)
        batch = (
            batch[["conv_id", "ts_us", "turn_idx", "user_ts", "user_turn"]]
            .sort_values(["conv_id", "ts_us", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(batch) == len(got)
        for c in want.columns:
            assert (batch[c].to_numpy() == got[c].to_numpy()).all(), c

    def test_forward_requires_tolerance(self, ray_session, tmp_path):
        from condor_ray.engine.streaming_asof import StreamingAsofJob

        with pytest.raises(ValueError, match="tolerance_us"):
            StreamingAsofJob(out_dir=str(tmp_path / "x"), direction="forward")

    def test_forward_state_bounded_by_tolerance_window(
        self, ray_session, asof_fragments, tmp_path
    ):
        """Forward purge keeps only builds inside the tolerance window, so
        the high-water mark must stay well under the stream length."""
        paths, df = asof_fragments
        got, summary = self._run(paths, tmp_path, "forward", self.TOL, "fbound")
        assert summary["max_buffered_rows"] < len(df)
