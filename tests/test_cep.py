"""CEP pattern matching: vectorized matcher vs brute force, SQL-twin parity,
streaming parity / fragmentation invariance / late drops / checkpoint-resume."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from condor_ray.pipelines.cep import (
    Step,
    find_match_starts,
    match_pattern,
    pattern_sql,
)

# ---------------------------------------------------------------- reference


def _pred(step: Step, v) -> bool:
    isna = pd.isna(v)
    if step.op == "eq":
        return (not isna) and v == step.value
    if step.op == "ne":
        return (not isna) and v != step.value
    if step.op == "notnull":
        return not isna
    if step.op == "isnull":
        return bool(isna)
    return (not isna) and v in step.value


def brute_matches(df: pd.DataFrame, steps, within_us=None):
    """O(n*k) per-conversation reference matcher."""
    out = []
    k = len(steps)
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    for cid, g in df.groupby("conv_id", sort=False):
        rows = g.to_dict("records")
        for i in range(len(rows) - k + 1):
            if not all(_pred(steps[j], rows[i + j][steps[j].col]) for j in range(k)):
                continue
            span = rows[i + k - 1]["ts"] - rows[i]["ts"]
            if within_us is not None and span > within_us:
                continue
            out.append(
                (
                    cid,
                    int(rows[i]["turn_idx"]),
                    int(rows[i + k - 1]["turn_idx"]),
                    int(rows[i]["ts"]),
                    int(rows[i + k - 1]["ts"]),
                )
            )
    return sorted(out)


def _rand_stream(n=600, n_convs=12, seed=0) -> pd.DataFrame:
    """Random stream with ts ties and NULL tools."""
    rng = np.random.default_rng(seed)
    conv = np.array([f"c{int(i)}" for i in rng.integers(0, n_convs, n)])
    # coarse ts so duplicates (ties) occur within a conv
    ts = rng.integers(0, max(n // 2, 1), n).astype(np.int64) * 1_000_000
    roles = rng.choice(["user", "assistant", "tool"], n)
    tool = np.where(
        rng.random(n) < 0.4, None, rng.choice(["search", "bash", "edit"], n)
    )
    df = pd.DataFrame({"conv_id": conv, "ts": ts, "role": roles, "tool": tool})
    # unique turn_idx per conv in ts order (stable tie-break)
    df = df.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int32)
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


PATTERNS = [
    ([Step("role", "eq", "user"), Step("tool", "notnull"),
      Step("role", "eq", "assistant")], 30_000_000),
    ([Step("role", "ne", "tool"), Step("role", "eq", "tool")], None),
    ([Step("tool", "isnull"), Step("tool", "in", ["search", "bash"])], 5_000_000),
    ([Step("role", "eq", "user")], None),  # k=1
]


@pytest.mark.parametrize("steps,within_us", PATTERNS)
def test_matcher_vs_bruteforce(steps, within_us):
    for seed in range(4):
        df = _rand_stream(seed=seed)
        s = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        conv = s["conv_id"].to_numpy()
        ts = s["ts"].to_numpy()
        turn = s["turn_idx"].to_numpy()
        cols = {c: s[c].to_numpy() for c in {st.col for st in steps}}
        starts = find_match_starts(conv, ts, cols, steps, within_us)
        k = len(steps)
        got = sorted(
            (conv[i], int(turn[i]), int(turn[i + k - 1]), int(ts[i]),
             int(ts[i + k - 1]))
            for i in starts
        )
        assert got == brute_matches(df, steps, within_us)


def test_match_pattern_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    df = _rand_stream(n=800, seed=3)
    steps, within_us = PATTERNS[0]
    got = (
        match_pattern(rd.from_pandas(df), steps, within_ms=within_us // 1000)
        .to_pandas()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    sdf = df.assign(ts=pd.to_datetime(df["ts"], unit="us"))
    con.register("stream_df", sdf)
    sql = pattern_sql(
        "WITH transcripts AS (SELECT * FROM stream_df)",
        steps,
        within_ms=within_us // 1000,
    )
    want = (
        con.execute(sql)
        .fetchdf()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


# ---------------------------------------------------------------- streaming


def _write_fragments(df: pd.DataFrame, out_dir: str, n_frag: int) -> list[str]:
    """Arrival-order fragments (df row order IS arrival order)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, len(df), n_frag + 1).astype(int)
    for i in range(n_frag):
        g = df.iloc[bounds[i] : bounds[i + 1]]
        p = os.path.join(out_dir, f"fragment-{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), p)
        paths.append(p)
    return paths


def _run_streaming(frags, steps, within_us, tmp, tag, **kw):
    from condor_ray.engine.streaming_cep import StreamingPatternJob

    out_dir = os.path.join(tmp, f"out-{tag}")
    job = StreamingPatternJob(
        steps,
        out_dir,
        within_ms=within_us // 1000 if within_us is not None else None,
        parallelism=3,
        **kw,
    )
    stats = job.run(frags)
    out = (
        job.result_dataset()
        .to_pandas()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    job.shutdown()
    return out, stats


def test_streaming_parity_and_fragmentation_invariance(ray_session, tmp_path):
    """Ts-ordered stream: streaming == batch matcher, for any fragmentation."""
    df = _rand_stream(n=900, seed=5).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    want = brute_matches(df, steps, within_us)
    outs = []
    for n_frag in (1, 3, 7):
        frags = _write_fragments(df, str(tmp_path / f"f{n_frag}"), n_frag)
        out, stats = _run_streaming(
            frags, steps, within_us, str(tmp_path), f"inv{n_frag}"
        )
        assert stats["late_dropped"] == 0
        got = sorted(
            tuple(r)
            for r in out[
                ["conv_id", "start_turn_idx", "end_turn_idx", "start_ts", "end_ts"]
            ].itertuples(index=False)
        )
        assert got == want
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]


def _late_oracle(frags, steps, within_us):
    """Sequential replay with the engine's late rule: a row with ts < carry-in
    watermark is dropped; survivors match over the full retained stream."""
    wm = -(2**62)
    kept = []
    n_late = 0
    for f in frags:
        g = pq.read_table(f).to_pandas()
        late = g["ts"].to_numpy() < wm
        n_late += int(late.sum())
        kept.append(g[~late])
        if len(g):
            wm = max(wm, int(g["ts"].max()))
    df = pd.concat(kept, ignore_index=True)
    return brute_matches(df, steps, within_us), n_late


def test_streaming_late_drops(ray_session, tmp_path):
    """Out-of-order stream: late rows are dropped + counted; emissions equal
    the sequential replay oracle under the same late rule."""
    rng = np.random.default_rng(11)
    df = _rand_stream(n=900, seed=7).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    # displace 10% of rows later in ARRIVAL order (they become late)
    idx = np.arange(len(df))
    movers = rng.choice(idx[:-60], 90, replace=False)
    arrival = np.concatenate([np.delete(idx, movers), movers])
    df = df.iloc[arrival].reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    frags = _write_fragments(df, str(tmp_path / "late"), 6)
    want, want_late = _late_oracle(frags, steps, within_us)
    out, stats = _run_streaming(frags, steps, within_us, str(tmp_path), "late")
    assert stats["late_dropped"] == want_late > 0
    got = sorted(
        tuple(r)
        for r in out[
            ["conv_id", "start_turn_idx", "end_turn_idx", "start_ts", "end_ts"]
        ].itertuples(index=False)
    )
    assert got == want


def test_streaming_checkpoint_resume(ray_session, tmp_path):
    """Crash after fragment 4, resume from checkpoint: emissions byte-equal
    the uninterrupted run."""
    df = _rand_stream(n=900, seed=9).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    frags = _write_fragments(df, str(tmp_path / "ck"), 8)

    full, _ = _run_streaming(frags, steps, within_us, str(tmp_path), "full")

    from condor_ray.engine.streaming_cep import StreamingPatternJob

    out_dir = str(tmp_path / "out-resumed")
    ck_dir = str(tmp_path / "ckpt")
    job = StreamingPatternJob(
        steps, out_dir, within_ms=within_us // 1000, parallelism=3,
        checkpoint_dir=ck_dir, checkpoint_every=2,
    )
    job.run(frags[:4], final_flush=False)  # "crash" after 4 fragments
    job.shutdown()

    job2 = StreamingPatternJob(
        steps, out_dir, within_ms=within_us // 1000, parallelism=3,
        checkpoint_dir=ck_dir, checkpoint_every=2,
    )
    assert job2.resume()
    assert job2.next_fragment == 4
    job2.run(frags, resume=False)
    resumed = (
        job2.result_dataset()
        .to_pandas()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    job2.shutdown()
    pd.testing.assert_frame_equal(resumed, full)


def test_step_validation():
    with pytest.raises(ValueError):
        Step("role", "bogus")
    with pytest.raises(ValueError):
        Step("role", "eq")
    with pytest.raises(ValueError):
        Step("role", "in", [])
    with pytest.raises(ValueError):
        match_pattern(None, [])


# ------------------------------------------------------------- followedBy


def brute_relaxed(df: pd.DataFrame, steps, within_us=None):
    """Scalar skip-till-next-match reference."""
    out = []
    k = len(steps)
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    for cid, g in df.groupby("conv_id", sort=False):
        rows = g.to_dict("records")
        for i in range(len(rows)):
            if not _pred(steps[0], rows[i][steps[0].col]):
                continue
            cur, ok = i, True
            for j in range(1, k):
                nxt = cur + 1
                while nxt < len(rows) and not _pred(steps[j], rows[nxt][steps[j].col]):
                    nxt += 1
                if nxt >= len(rows):
                    ok = False
                    break
                cur = nxt
            if not ok:
                continue
            if within_us is not None and rows[cur]["ts"] - rows[i]["ts"] > within_us:
                continue
            out.append(
                (cid, int(rows[i]["turn_idx"]), int(rows[cur]["turn_idx"]),
                 int(rows[i]["ts"]), int(rows[cur]["ts"]))
            )
    return sorted(out)


@pytest.mark.parametrize("steps,within_us", PATTERNS)
def test_relaxed_matcher_vs_bruteforce(steps, within_us):
    from condor_ray.pipelines.cep import find_relaxed_matches

    for seed in range(4):
        df = _rand_stream(seed=seed)
        s = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        conv = s["conv_id"].to_numpy()
        ts = s["ts"].to_numpy()
        turn = s["turn_idx"].to_numpy()
        cols = {c: s[c].to_numpy() for c in {st.col for st in steps}}
        start, end = find_relaxed_matches(conv, ts, cols, steps, within_us)
        got = sorted(
            (conv[i], int(turn[i]), int(turn[e]), int(ts[i]), int(ts[e]))
            for i, e in zip(start, end)
        )
        assert got == brute_relaxed(df, steps, within_us)


def test_relaxed_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from condor_ray.pipelines.cep import match_pattern_relaxed, pattern_relaxed_sql

    df = _rand_stream(n=800, seed=13)
    steps, within_us = PATTERNS[0]
    got = (
        match_pattern_relaxed(rd.from_pandas(df), steps, within_ms=within_us // 1000)
        .to_pandas()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("stream_df", df.assign(ts=pd.to_datetime(df["ts"], unit="us")))
    want = (
        con.execute(
            pattern_relaxed_sql(
                "WITH transcripts AS (SELECT * FROM stream_df)",
                steps,
                within_ms=within_us // 1000,
            )
        )
        .fetchdf()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_relaxed_superset_of_strict():
    """Every strict-contiguity match start also starts a relaxed chain (the
    relaxed end may differ only when an earlier predicate row intervenes —
    with the chain construction the relaxed end is <= the strict end)."""
    from condor_ray.pipelines.cep import find_relaxed_matches

    df = _rand_stream(n=700, seed=2)
    steps, _ = PATTERNS[0]
    s = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    conv = s["conv_id"].to_numpy()
    ts = s["ts"].to_numpy()
    cols = {c: s[c].to_numpy() for c in {st.col for st in steps}}
    strict = set(find_match_starts(conv, ts, cols, steps, None).tolist())
    rel_start, rel_end = find_relaxed_matches(conv, ts, cols, steps, None)
    rel = dict(zip(rel_start.tolist(), rel_end.tolist()))
    k = len(steps)
    for i in strict:
        assert i in rel
        assert rel[i] <= i + k - 1


def test_streaming_relaxed_parity_and_invariance(ray_session, tmp_path):
    """Relaxed streaming: emissions equal the batch followedBy matcher for
    any fragmentation; the lookback buffer stays within()-bounded."""
    df = _rand_stream(n=900, seed=21).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    want = brute_relaxed(df, steps, within_us)
    assert len(want) > 0
    outs = []
    for n_frag in (1, 4, 9):
        frags = _write_fragments(df, str(tmp_path / f"rf{n_frag}"), n_frag)
        out, stats = _run_streaming(
            frags, steps, within_us, str(tmp_path), f"rinv{n_frag}",
            contiguity="relaxed",
        )
        got = sorted(
            tuple(r)
            for r in out[
                ["conv_id", "start_turn_idx", "end_turn_idx", "start_ts", "end_ts"]
            ].itertuples(index=False)
        )
        assert got == want
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]


def test_streaming_relaxed_late_drops(ray_session, tmp_path):
    """Out-of-order stream under relaxed contiguity == sequential replay
    oracle with the same late rule."""
    rng = np.random.default_rng(31)
    df = _rand_stream(n=900, seed=17).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    idx = np.arange(len(df))
    movers = rng.choice(idx[:-60], 90, replace=False)
    arrival = np.concatenate([np.delete(idx, movers), movers])
    df = df.iloc[arrival].reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    frags = _write_fragments(df, str(tmp_path / "rlate"), 6)
    # sequential oracle: late rule, then batch relaxed matcher over survivors
    wm = -(2**62)
    kept, n_late = [], 0
    for f in frags:
        g = pq.read_table(f).to_pandas()
        late = g["ts"].to_numpy() < wm
        n_late += int(late.sum())
        kept.append(g[~late])
        if len(g):
            wm = max(wm, int(g["ts"].max()))
    want = brute_relaxed(pd.concat(kept, ignore_index=True), steps, within_us)
    out, stats = _run_streaming(
        frags, steps, within_us, str(tmp_path), "rlate", contiguity="relaxed"
    )
    assert stats["late_dropped"] == n_late > 0
    got = sorted(
        tuple(r)
        for r in out[
            ["conv_id", "start_turn_idx", "end_turn_idx", "start_ts", "end_ts"]
        ].itertuples(index=False)
    )
    assert got == want


def test_streaming_relaxed_requires_within(ray_session, tmp_path):
    from condor_ray.engine.streaming_cep import StreamingPatternJob

    with pytest.raises(ValueError):
        StreamingPatternJob(
            PATTERNS[0][0], str(tmp_path / "x"), within_ms=None,
            contiguity="relaxed",
        )


# ------------------------------------------------------- hypothesis matchers

from hypothesis import given, settings, strategies as st

_STEP_POOL = [
    Step("role", "eq", "user"),
    Step("role", "eq", "assistant"),
    Step("role", "ne", "tool"),
    Step("tool", "notnull"),
    Step("tool", "isnull"),
    Step("tool", "in", ["search", "bash"]),
]

_gen_steps = st.lists(st.sampled_from(_STEP_POOL), min_size=1, max_size=4)
_gen_within = st.sampled_from([None, 2_000_000, 20_000_000])
_gen_n = st.integers(min_value=0, max_value=120)
_gen_seed = st.integers(min_value=0, max_value=10_000)


def _hyp_stream(n: int, seed: int) -> pd.DataFrame:
    if n == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.Series(dtype=object),
                "ts": pd.Series(dtype=np.int64),
                "role": pd.Series(dtype=object),
                "tool": pd.Series(dtype=object),
                "turn_idx": pd.Series(dtype=np.int32),
            }
        )
    return _rand_stream(n=n, n_convs=4, seed=seed)


@settings(max_examples=40, deadline=None)
@given(_gen_steps, _gen_within, _gen_n, _gen_seed)
def test_hyp_strict_matcher(steps, within_us, n, seed):
    df = _hyp_stream(n, seed)
    s = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    conv = s["conv_id"].to_numpy()
    ts = s["ts"].to_numpy()
    turn = s["turn_idx"].to_numpy()
    cols = {c: s[c].to_numpy() for c in {stp.col for stp in steps}}
    k = len(steps)
    starts = find_match_starts(conv, ts, cols, steps, within_us)
    got = sorted(
        (conv[i], int(turn[i]), int(turn[i + k - 1]), int(ts[i]),
         int(ts[i + k - 1]))
        for i in starts
    )
    assert got == brute_matches(df, steps, within_us)


@settings(max_examples=40, deadline=None)
@given(_gen_steps, _gen_within, _gen_n, _gen_seed)
def test_hyp_relaxed_matcher(steps, within_us, n, seed):
    from condor_ray.pipelines.cep import find_relaxed_matches

    df = _hyp_stream(n, seed)
    s = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    conv = s["conv_id"].to_numpy()
    ts = s["ts"].to_numpy()
    turn = s["turn_idx"].to_numpy()
    cols = {c: s[c].to_numpy() for c in {stp.col for stp in steps}}
    start, end = find_relaxed_matches(conv, ts, cols, steps, within_us)
    got = sorted(
        (conv[i], int(turn[i]), int(turn[e]), int(ts[i]), int(ts[e]))
        for i, e in zip(start, end)
    )
    assert got == brute_relaxed(df, steps, within_us)


def test_streaming_relaxed_checkpoint_resume(ray_session, tmp_path):
    """Relaxed mode crash/resume: emissions byte-equal the uninterrupted
    run (prev_wm + lookback buffer are part of the snapshot)."""
    df = _rand_stream(n=900, seed=23).sort_values(
        ["ts", "conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    steps, within_us = PATTERNS[0]
    frags = _write_fragments(df, str(tmp_path / "rck"), 8)

    full, _ = _run_streaming(
        frags, steps, within_us, str(tmp_path), "rfull", contiguity="relaxed"
    )

    from condor_ray.engine.streaming_cep import StreamingPatternJob

    out_dir = str(tmp_path / "out-rresumed")
    ck_dir = str(tmp_path / "rckpt")
    kw = dict(within_ms=within_us // 1000, parallelism=3,
              checkpoint_dir=ck_dir, checkpoint_every=2, contiguity="relaxed")
    job = StreamingPatternJob(steps, out_dir, **kw)
    job.run(frags[:4], final_flush=False)
    job.shutdown()
    job2 = StreamingPatternJob(steps, out_dir, **kw)
    assert job2.resume() and job2.next_fragment == 4
    job2.run(frags, resume=False)
    resumed = (
        job2.result_dataset()
        .to_pandas()
        .sort_values(["conv_id", "start_ts", "start_turn_idx"])
        .reset_index(drop=True)
    )
    job2.shutdown()
    pd.testing.assert_frame_equal(resumed, full)


def test_intern_table_compacts_with_conversation_churn(ray_session, tmp_path):
    """conv_ids/conv_names must stay O(live conversations), not
    O(stream-lifetime conversations): with millions of short-lived convs
    the intern table (and every checkpoint) would otherwise grow without
    bound."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from condor_ray.engine.streaming_cep import StreamingPatternJob

    frag_dir = tmp_path / "frags"
    frag_dir.mkdir()
    paths = []
    n_frag, per_frag = 12, 1500  # 18k distinct convs, all short-lived
    for k in range(n_frag):
        base = k * per_frag
        tbl = pa.table(
            {
                "conv_id": pa.array([f"conv{base + i}" for i in range(per_frag)]),
                "turn_idx": pa.array(np.zeros(per_frag, dtype=np.int64)),
                "role": pa.array(["user"] * per_frag),
                "ts": pa.array(
                    (k * per_frag + np.arange(per_frag, dtype=np.int64))
                    * 1_000_000
                ).cast(pa.timestamp("us")),
            }
        )
        p = str(frag_dir / f"f{k:03d}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    job = StreamingPatternJob(
        [Step("role", "eq", "user"), Step("role", "eq", "user")],
        str(tmp_path / "out"),
        within_ms=2_000,
        parallelism=2,
    )
    job.run(paths)
    interned = sum(
        s["interned_convs"] for s in __import__("ray").get(
            [st.stats.remote() for st in job.stores]
        )
    )
    total = n_frag * per_frag
    # every conv was seen once; compaction must have dropped the dead ones
    assert interned < total / 2, (interned, total)
    n_matches = job.result_dataset().count()
    job.shutdown()
    assert n_matches == 0  # single-row convs can't match a 2-step pattern


def test_null_conv_id_rows_survive_streaming(ray_session, tmp_path):
    """Null conv_id rows intern under the None name; the split task and the
    pattern store must not crash on the null dictionary index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from condor_ray.engine.streaming_cep import StreamingPatternJob

    tbl = pa.table(
        {
            "conv_id": pa.array(["a", None, None, "a"]),
            "turn_idx": pa.array(np.arange(4, dtype=np.int64)),
            "role": pa.array(["user", "user", "user", "user"]),
            "ts": pa.array(
                np.arange(4, dtype=np.int64) * 1_000_000
            ).cast(pa.timestamp("us")),
        }
    )
    frag = str(tmp_path / "f0.parquet")
    pq.write_table(tbl, frag)
    job = StreamingPatternJob(
        [Step("role", "eq", "user"), Step("role", "eq", "user")],
        str(tmp_path / "out"),
        within_ms=10_000,
        parallelism=2,
    )
    job.run([frag])
    out = job.result_dataset().to_pandas()
    job.shutdown()
    # "a" rows (turns 0,3) are adjacent within the conv -> 1 match; the two
    # null rows (turns 1,2) form their own conversation -> 1 match
    assert len(out) == 2
    assert out["conv_id"].isna().sum() == 1
