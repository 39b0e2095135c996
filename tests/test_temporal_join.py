"""Generic temporal joins: asof_join / interval_join vs per-key brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame, tol=None):
    rows = []
    for _, l in left.iterrows():
        cand = right[(right["k"] == l["k"]) & (right["ts"] <= l["ts"])]
        if tol is not None:
            cand = cand[cand["ts"] >= l["ts"] - tol]
        if cand.empty:
            rows.append((l["k"], l["ts"], l["lv"], np.nan, np.nan))
        else:
            best = cand.sort_values(["ts", "rv"]).iloc[-1]
            rows.append((l["k"], l["ts"], l["lv"], best["ts"], best["rv"]))
    return (
        pd.DataFrame(rows, columns=["k", "ts_us", "lv", "r_ts", "rv"])
        .sort_values(["k", "ts_us", "lv"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(5)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": [f"k{i}" for i in rng.integers(0, 12, n_l)],
            "ts": rng.integers(0, 500, n_l).astype(np.int64),  # dup ts likely
            "lv": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            # k11 never on right; k12 only on right
            "k": [f"k{i}" for i in rng.integers(1, 13, n_r)],
            "ts": rng.integers(0, 500, n_r).astype(np.int64),
            "rv": np.arange(n_r, dtype=np.int64),
        }
    )
    return left, right


def _run_asof(left, right, tol=None, n_buckets=8):
    import ray.data as rd

    from condor_ray.pipelines.temporal_join import asof_join

    out = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key="k",
        ts="ts",
        left_cols={"lv": "lv"},
        right_cols={"r_ts": "ts", "rv": "rv"},
        right_order=("rv",),
        tolerance_us=tol,
        n_buckets=n_buckets,
    ).to_pandas()
    return out.sort_values(["k", "ts_us", "lv"]).reset_index(drop=True)


class TestAsofJoin:
    def test_matches_brute_force(self, ray_session, sides):
        left, right = sides
        got = _run_asof(left, right)
        want = _brute_asof(left, right)
        assert len(got) == len(left)
        for c in ["k", "ts_us", "lv"]:
            assert (got[c].to_numpy() == want[c].to_numpy()).all()
        for c in ["r_ts", "rv"]:  # NaN-tolerant compare
            a, b = got[c].to_numpy(float), want[c].to_numpy(float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()

    def test_tolerance(self, ray_session, sides):
        left, right = sides
        got = _run_asof(left, right, tol=25)
        want = _brute_asof(left, right, tol=25)
        a, b = got["rv"].to_numpy(float), want["rv"].to_numpy(float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        assert np.isnan(a).sum() > np.isnan(_run_asof(left, right)["rv"].to_numpy(float)).sum()

    def test_bucket_count_invariant(self, ray_session, sides):
        left, right = sides
        a = _run_asof(left, right, n_buckets=3)
        b = _run_asof(left, right, n_buckets=17)
        pd.testing.assert_frame_equal(a, b)

    def test_forward_direction(self, ray_session, sides):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left, right = sides
        got = (
            asof_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key="k",
                ts="ts",
                left_cols={"lv": "lv"},
                right_cols={"r_ts": "ts", "rv": "rv"},
                right_order=("rv",),
                direction="forward",
            )
            .to_pandas()
            .sort_values(["k", "ts_us", "lv"])
            .reset_index(drop=True)
        )
        # brute force: earliest right at-or-after; ties -> least (ts, rv)
        rows = []
        for _, l in left.iterrows():
            cand = right[(right["k"] == l["k"]) & (right["ts"] >= l["ts"])]
            if cand.empty:
                rows.append((l["k"], l["ts"], l["lv"], np.nan, np.nan))
            else:
                best = cand.sort_values(["ts", "rv"]).iloc[0]
                rows.append((l["k"], l["ts"], l["lv"], best["ts"], best["rv"]))
        want = (
            pd.DataFrame(rows, columns=["k", "ts_us", "lv", "r_ts", "rv"])
            .sort_values(["k", "ts_us", "lv"])
            .reset_index(drop=True)
        )
        for c in ["r_ts", "rv"]:
            a, b = got[c].to_numpy(float), want[c].to_numpy(float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()

    def test_bad_direction_raises(self, ray_session, sides):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left, right = sides
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                rd.from_pandas(left), rd.from_pandas(right),
                key="k", ts="ts", direction="sideways",
            )

    def test_broadcast_matches_partitioned(self, ray_session, sides):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left, right = sides
        got = (
            asof_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key="k",
                ts="ts",
                left_cols={"lv": "lv"},
                right_cols={"r_ts": "ts", "rv": "rv"},
                right_order=("rv",),
                broadcast=True,
            )
            .to_pandas()
            .sort_values(["k", "ts_us", "lv"])
            .reset_index(drop=True)
        )
        want = _run_asof(left, right)
        assert (got["lv"].to_numpy() == want["lv"].to_numpy()).all()
        for c in ["r_ts", "rv"]:
            a, b = got[c].to_numpy(float), want[c].to_numpy(float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()

    def test_output_name_collision_raises(self, ray_session, sides):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left, right = sides
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                key="k",
                ts="ts",
                left_cols={"v": "lv"},
                right_cols={"v": "rv"},
            )


class TestAsofSkew:
    def test_hot_key_half_of_stream(self, ray_session):
        """One conversation owns 50% of both sides — the exchange gets an
        unbalanced bucket but stays correct (merge is per-bucket local)."""
        rng = np.random.default_rng(9)
        n = 2000
        hot = rng.random(n) < 0.5
        left = pd.DataFrame(
            {
                "k": np.where(hot, "hot", [f"k{i}" for i in rng.integers(0, 40, n)]),
                "ts": rng.integers(0, 300, n).astype(np.int64),
                "lv": np.arange(n, dtype=np.int64),
            }
        )
        hot_r = rng.random(n // 2) < 0.5
        right = pd.DataFrame(
            {
                "k": np.where(
                    hot_r, "hot", [f"k{i}" for i in rng.integers(0, 40, n // 2)]
                ),
                "ts": rng.integers(0, 300, n // 2).astype(np.int64),
                "rv": np.arange(n // 2, dtype=np.int64),
            }
        )
        got = _run_asof(left, right)
        want = _brute_asof(left, right)
        assert len(got) == n
        for c in ["r_ts", "rv"]:
            a, b = got[c].to_numpy(float), want[c].to_numpy(float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


class TestIntervalJoin:
    def test_containment(self, ray_session):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import interval_join

        points = pd.DataFrame(
            {
                "k": ["a", "a", "a", "a", "b", "b", "c"],
                "ts": np.array([5, 10, 25, 40, 8, 100, 7], dtype=np.int64),
                "pid": np.arange(7, dtype=np.int64),
            }
        )
        intervals = pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "lo": np.array([0, 20, 0], dtype=np.int64),
                "hi": np.array([12, 30, 50], dtype=np.int64),
                "iid": np.array([0, 1, 2], dtype=np.int64),
            }
        )
        got = (
            interval_join(
                rd.from_pandas(points),
                rd.from_pandas(intervals),
                key="k",
                ts="ts",
                start="lo",
                end="hi",
                point_cols={"pid": "pid"},
                interval_cols={"iid": "iid"},
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )
        # pid 3 (ts=40 after [20,30]), pid 5 (ts=100 > 50), pid 6 (key c) drop
        assert got["pid"].tolist() == [0, 1, 2, 4]
        assert got["iid"].astype(int).tolist() == [0, 0, 1, 2]
        assert got["lo"].dtype == np.int64 and got["hi"].dtype == np.int64


class TestAsofKeyValidation:
    def test_non_string_key_raises(self, ray_session):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left = pa.table(
            {
                "conv_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([10, 20], pa.timestamp("us")),
                "v": pa.array([1.0, 2.0]),
            }
        )
        with pytest.raises(TypeError, match="must be a string column"):
            asof_join(
                rd.from_arrow(left),
                rd.from_arrow(left),
                left_cols={"v": "v"},
                right_cols={"rv": "v"},
            )

    def test_dictionary_string_key_matches_plain(self, ray_session, sides):
        """dictionary<string> keys (parquet read_dictionary, upstream
        dictionary_encode) must validate AND join identically to plain
        string keys — the shard path normalizes them to pa.string()."""
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left, right = sides

        def dict_encoded(df):
            t = pa.Table.from_pandas(df, preserve_index=False)
            return t.set_column(
                t.schema.get_field_index("k"),
                "k",
                t["k"].combine_chunks().dictionary_encode(),
            )

        def run(make_left, make_right, broadcast=False):
            out = asof_join(
                rd.from_arrow(make_left),
                rd.from_arrow(make_right),
                key="k",
                ts="ts",
                left_cols={"lv": "lv"},
                right_cols={"r_ts": "ts", "rv": "rv"},
                right_order=("rv",),
                n_buckets=4,
                broadcast=broadcast,
            ).to_pandas()
            return out.sort_values(["k", "ts_us", "lv"]).reset_index(drop=True)

        plain = run(
            pa.Table.from_pandas(left, preserve_index=False),
            pa.Table.from_pandas(right, preserve_index=False),
        )
        dicted = run(dict_encoded(left), dict_encoded(right))
        pd.testing.assert_frame_equal(plain, dicted)
        # broadcast binding takes a different projection path — cover it too
        bcast = run(dict_encoded(left), dict_encoded(right), broadcast=True)
        pd.testing.assert_frame_equal(plain, bcast)


class TestAsofSchemaStability:
    """Eighth-wave regressions: every emitted block must carry ONE canonical
    schema — empty buckets, unmatched-string buckets, all-matched broadcast
    batches, and zero-block right sides included."""

    def test_empty_and_unmatched_buckets_concat(self, ray_session):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        # one key, 64 buckets -> 63 buckets see zero left rows; string right
        # column exercises the all-None -> null-type drift
        left = pd.DataFrame({"k": ["a"] * 5, "ts": np.arange(5, dtype=np.int64), "lv": ["x"] * 5})
        right = pd.DataFrame({"k": ["zzz"], "ts": np.array([0], np.int64), "rs": ["hello"]})
        out = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", ts="ts",
            left_cols={"lv": "lv"}, right_cols={"rs": "rs"},
            n_buckets=64,
        )
        import ray

        blocks = [b for b in ray.get(out.to_arrow_refs())]
        types = {b.schema.field("rs").type for b in blocks}
        assert types == {pa.string()}  # every block, including empty ones
        df = pa.concat_tables(blocks).to_pandas()  # cross-block concat works
        assert len(df) == 5
        assert df["rs"].isna().all()  # no right match
        assert df["lv"].tolist() == ["x"] * 5  # left strings survive

    def test_broadcast_int_dtype_parity(self, ray_session):
        """A broadcast batch where EVERY row matches must still emit float64
        right ints (partitioned-path parity), not int64."""
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left = pd.DataFrame({"k": ["a", "a"], "ts": np.array([10, 20], np.int64)})
        right = pd.DataFrame({"k": ["a"], "ts": np.array([1], np.int64), "rv": np.array([7], np.int64)})
        for bcast in (False, True):
            out = asof_join(
                rd.from_pandas(left), rd.from_pandas(right),
                key="k", ts="ts", right_cols={"rv": "rv"},
                n_buckets=4, broadcast=bcast,
            ).to_pandas()
            assert out["rv"].dtype == np.float64, f"broadcast={bcast}"
            assert out["rv"].tolist() == [7.0, 7.0]

    def test_broadcast_zero_block_right(self, ray_session):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left = pd.DataFrame({"k": ["a"], "ts": np.array([10], np.int64)})
        right = pd.DataFrame({"k": pd.Series(dtype=object), "ts": pd.Series(dtype=np.int64), "rv": pd.Series(dtype=np.int64)})
        out = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", ts="ts", right_cols={"rv": "rv"},
            broadcast=True,
        ).to_pandas()
        assert len(out) == 1 and np.isnan(out["rv"].iloc[0])

    def test_reserved_output_names_raise(self, ray_session):
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        left = pd.DataFrame({"k": ["a"], "ts": np.array([1], np.int64), "v": [1.0]})
        ds = rd.from_pandas(left)
        with pytest.raises(ValueError, match="join columns"):
            asof_join(ds, ds, key="k", ts="ts", left_cols={"k": "v"})
        with pytest.raises(ValueError, match="join columns"):
            asof_join(ds, ds, key="k", ts="ts", right_cols={"ts_us": "v"})
