"""Task-based hash exchange: routing correctness + schema stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_shard_by_mod():
    """Closure (pickled by value — workers cannot import the tests pkg)."""

    def shard(block, n_buckets):
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        empty = pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
        if block.num_rows == 0 or "k" not in block.schema.names:
            return tuple(empty for _ in range(n_buckets))
        from condor_ray.engine.exchange import split_by_partition

        part = block["k"].to_numpy() % n_buckets
        return split_by_partition(
            block.combine_chunks(), part.astype(np.int64), n_buckets
        )

    return shard


class TestSplitByPartition:
    def test_partition_of_rows_is_exact(self):
        from condor_ray.engine.exchange import split_by_partition

        rng = np.random.default_rng(1)
        k = rng.integers(0, 7, 1000)
        tbl = pa.table({"k": k, "v": np.arange(1000)})
        parts = split_by_partition(tbl, (k % 7).astype(np.int64), 7)
        assert sum(p.num_rows for p in parts) == 1000
        for q, p in enumerate(parts):
            assert (p["k"].to_numpy() % 7 == q).all()
        # union of v across parts == all rows exactly once
        allv = np.concatenate([p["v"].to_numpy() for p in parts])
        assert sorted(allv.tolist()) == list(range(1000))


class TestHashExchange:
    def test_one_sided_groupwise_sum(self, ray_session):
        import ray.data as rd

        from condor_ray.engine.exchange import hash_exchange

        rng = np.random.default_rng(2)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 100, 5000).astype(np.int64),
                "v": rng.integers(0, 10, 5000).astype(np.int64),
            }
        )

        def combine(*tables):
            tables = [t for t in tables if t.num_rows]
            schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
            if not tables:
                return schema.empty_table()
            g = pa.concat_tables(tables).to_pandas().groupby("k", as_index=False)["v"].sum()
            return pa.table({"k": g["k"].astype(np.int64), "s": g["v"].astype(np.int64)})

        got = (
            hash_exchange(rd.from_pandas(df).repartition(8), 5, _make_shard_by_mod(), combine)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            df.groupby("k", as_index=False)["v"].sum()
            .rename(columns={"v": "s"})
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_two_sided_bucket_alignment(self, ray_session):
        import ray.data as rd

        from condor_ray.engine.exchange import two_sided_hash_exchange

        left = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50, dtype=np.int64)})
        right = pd.DataFrame({"k": np.arange(0, 100, 2, dtype=np.int64), "v": np.arange(50, dtype=np.int64) * 10})

        def combine(n_left, *tables):
            lefts = [t for t in tables[:n_left] if t.num_rows]
            rights = [t for t in tables[n_left:] if t.num_rows]
            schema = pa.schema([("k", pa.int64()), ("lv", pa.int64()), ("rv", pa.int64())])
            if not lefts or not rights:
                return schema.empty_table()
            lf = pa.concat_tables(lefts).to_pandas()
            rf = pa.concat_tables(rights).to_pandas().rename(columns={"v": "rv"})
            m = lf.rename(columns={"v": "lv"}).merge(rf, on="k", how="inner")
            return pa.table(
                {"k": m["k"].astype(np.int64), "lv": m["lv"].astype(np.int64),
                 "rv": m["rv"].astype(np.int64)}
            )

        got = (
            two_sided_hash_exchange(
                rd.from_pandas(left).repartition(4),
                rd.from_pandas(right).repartition(3),
                6, _make_shard_by_mod(), _make_shard_by_mod(), combine,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # every even k < 50 joins exactly once: rv = (k/2)*10
        assert got["k"].tolist() == list(range(0, 50, 2))
        assert (got["rv"].to_numpy() == got["k"].to_numpy() // 2 * 10).all()


class TestFragmentWriterOnExchange:
    def test_time_ordered_fragments(self, ray_session, tmp_path):
        import ray.data as rd

        from condor_ray.pipelines.core import write_time_ordered_fragments

        rng = np.random.default_rng(4)
        n = 8000
        df = pd.DataFrame(
            {
                "conv_id": [f"c{i}" for i in rng.integers(0, 50, n)],
                "turn_idx": rng.integers(0, 100, n).astype(np.int32),
                "ts": rng.integers(0, 10_000_000, n).astype(np.int64),
            }
        )
        src = pa.Table.from_pandas(df, preserve_index=False)
        src = src.set_column(
            src.schema.get_field_index("ts"), "ts", src["ts"].cast(pa.timestamp("us"))
        )
        out = str(tmp_path / "frags")
        import os

        os.makedirs(out)
        manifest = write_time_ordered_fragments(
            rd.from_arrow(src).repartition(6), out, n_frag=5
        )
        assert manifest["rows"].sum() == n
        files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
        assert 1 <= len(files) <= 5
        import pyarrow.parquet as pq

        ranges, total = [], 0
        for f in files:
            t = pq.read_table(os.path.join(out, f))
            total += t.num_rows
            ts = t["ts"].cast(pa.int64()).to_numpy()
            assert (np.diff(ts) >= 0).all()  # ts-sorted within fragment
            ranges.append((ts.min(), ts.max()))
        assert total == n
        # fragments are disjoint, ordered time ranges
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi < b_lo


class TestWaveBoundedExchange:
    def test_multi_wave_folds_match_single_wave(self, ray_session, monkeypatch):
        """Force a tiny wave so the fold path runs (>=2 waves + raw tail)
        and verify the result is identical to the unfolded computation."""
        import ray.data as rd

        import condor_ray.engine.exchange as ex

        monkeypatch.setattr(ex, "_wave_blocks", lambda: 3)
        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 40, 4000).astype(np.int64),
                "v": rng.integers(0, 10, 4000).astype(np.int64),
            }
        )

        def combine(*tables):
            tables = [t for t in tables if t.num_rows]
            schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])
            if not tables:
                return schema.empty_table()
            g = pa.concat_tables(tables).to_pandas().groupby("k", as_index=False)["v"].sum()
            return pa.table({"k": g["k"].astype(np.int64), "s": g["v"].astype(np.int64)})

        got = (
            ex.hash_exchange(rd.from_pandas(df).repartition(10), 4, _make_shard_by_mod(), combine)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        stats = dict(ex.LAST_EXCHANGE_STATS)
        want = (
            df.groupby("k", as_index=False)["v"].sum()
            .rename(columns={"v": "s"})
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # 10 blocks at wave=3 -> 3 folded waves + 1 raw tail block
        assert stats["shard_tasks"] == 10
        assert stats["waves"] == 3
        assert stats["tail_blocks"] == 1
        assert stats["live_bytes_hwm"] > 0
        # folded_bytes reports FOLD-COPY volume only (3 folded waves here);
        # the raw tail block's bytes go to tail_bytes, not folded_bytes
        assert stats["folded_bytes"] > 0
        assert stats["tail_bytes"] > 0
        assert stats["live_bytes_hwm"] >= stats["folded_bytes"]

    def test_single_wave_takes_raw_tail_path(self, ray_session):
        """Small inputs (fewer blocks than one wave) must skip the fold
        copy entirely — the pre-wave zero-extra-copy path — while still
        reporting the resident tail bytes in live_bytes_hwm."""
        import ray.data as rd

        import condor_ray.engine.exchange as ex

        df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.ones(100, dtype=np.int64)})

        def combine(*tables):
            tables = [t for t in tables if t.num_rows]
            if not tables:
                return pa.schema([("k", pa.int64()), ("v", pa.int64())]).empty_table()
            return pa.concat_tables(tables)

        got = ex.hash_exchange(
            rd.from_pandas(df).repartition(4), 3, _make_shard_by_mod(), combine
        ).to_pandas()
        assert sorted(got["k"].tolist()) == list(range(100))
        stats = dict(ex.LAST_EXCHANGE_STATS)
        assert stats["waves"] == 0
        assert stats["tail_blocks"] == 4
        # no fold copy, but the raw tail is resident until the combines
        # consume it — the footprint must say so, not report 0
        assert stats["live_bytes_hwm"] > 0
        # ...and a zero-fold exchange must not claim its tail was folded
        assert stats["folded_bytes"] == 0
        assert stats["tail_bytes"] == stats["live_bytes_hwm"]

    def test_n_buckets_one(self, ray_session):
        """num_returns=1 returns a bare ref; the exchange must still work
        (asof_join(n_buckets=1), write_time_ordered_fragments(n_frag=1))."""
        import ray.data as rd

        from condor_ray.engine.exchange import hash_exchange

        df = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "v": np.ones(20, dtype=np.int64)})

        def combine(*tables):
            tables = [t for t in tables if t.num_rows]
            if not tables:
                return pa.schema([("k", pa.int64()), ("v", pa.int64())]).empty_table()
            return pa.concat_tables(tables)

        got = hash_exchange(
            rd.from_pandas(df).repartition(3), 1, _make_shard_by_mod(), combine
        ).to_pandas()
        assert sorted(got["k"].tolist()) == list(range(20))

    def test_two_sided_multi_wave(self, ray_session, monkeypatch):
        import ray.data as rd

        import condor_ray.engine.exchange as ex

        monkeypatch.setattr(ex, "_wave_blocks", lambda: 2)
        left = pd.DataFrame({"k": np.arange(60, dtype=np.int64), "v": np.arange(60, dtype=np.int64)})
        right = pd.DataFrame({"k": np.arange(0, 120, 2, dtype=np.int64), "v": np.arange(60, dtype=np.int64) * 10})

        def combine(n_left, *tables):
            lefts = [t for t in tables[:n_left] if t.num_rows]
            rights = [t for t in tables[n_left:] if t.num_rows]
            schema = pa.schema([("k", pa.int64()), ("lv", pa.int64()), ("rv", pa.int64())])
            if not lefts or not rights:
                return schema.empty_table()
            lf = pa.concat_tables(lefts).to_pandas().rename(columns={"v": "lv"})
            rf = pa.concat_tables(rights).to_pandas().rename(columns={"v": "rv"})
            m = lf.merge(rf, on="k", how="inner")
            return pa.table(
                {"k": m["k"].astype(np.int64), "lv": m["lv"].astype(np.int64),
                 "rv": m["rv"].astype(np.int64)}
            )

        got = (
            ex.two_sided_hash_exchange(
                rd.from_pandas(left).repartition(5),
                rd.from_pandas(right).repartition(4),
                6, _make_shard_by_mod(), _make_shard_by_mod(), combine,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == list(range(0, 60, 2))
        assert (got["rv"].to_numpy() == got["k"].to_numpy() // 2 * 10).all()
        assert ex.LAST_EXCHANGE_STATS["waves"] >= 3


class TestFragmentSchemaPin:
    def test_all_null_column_keeps_declared_type(self, ray_session, tmp_path):
        """A fragment whose ``tool`` column is all-null must still be
        written as parquet type string (the shards' Arrow schema is pinned
        through the pandas sort round-trip) — a ``null``-typed fragment
        poisons the cache with mixed schemas for every later consumer."""
        import os

        import ray.data as rd

        from condor_ray.pipelines.core import write_time_ordered_fragments

        n = 600
        src = pa.table(
            {
                "conv_id": pa.array([f"c{i % 7}" for i in range(n)]),
                "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
                "tool": pa.array([None] * n, type=pa.string()),
                "ts": pa.array(
                    np.arange(n, dtype=np.int64) * 1000, type=pa.timestamp("us")
                ),
            }
        )
        out = str(tmp_path / "frags_nulltool")
        os.makedirs(out)
        manifest = write_time_ordered_fragments(
            rd.from_arrow(src).repartition(4), out, n_frag=3
        )
        assert manifest["rows"].sum() == n
        import pyarrow.parquet as pq

        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(out, f))
            assert t.schema.field("tool").type == pa.string()
            assert t.schema.field("ts").type == pa.timestamp("us")


class TestFixtureSpecGuard:
    def test_explicit_out_dir_spec_mismatch_raises(self, tmp_path):
        from condor_ray.sources.transcripts import generate_stream_fixture

        out = str(tmp_path / "fix")
        generate_stream_fixture(
            n_rows=300, n_convs=10, seed=1, n_fragments=2, out_dir=out
        )
        # same spec: cached reuse is fine
        assert (
            generate_stream_fixture(
                n_rows=300, n_convs=10, seed=1, n_fragments=2, out_dir=out
            )
            == out
        )
        # different spec into the same explicit dir: must refuse, not
        # silently return the stale 300-row fixture
        with pytest.raises(ValueError, match="spec"):
            generate_stream_fixture(
                n_rows=900, n_convs=10, seed=1, n_fragments=2, out_dir=out
            )
