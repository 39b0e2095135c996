"""Round-2 driver queries vs their DuckDB oracles at sf0.001 — the same
compare the grader's correctness gate performs (columns sorted by name,
row-order-insensitive, exact values), run inside pytest so the suite is
self-contained proof for the new surfaces: HLL accuracy contract,
multi-window shared slices, streaming join, stratified queryLatest,
per-session synopsis ingestion, wavelet sum reconstruction."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

# registry names (streaming twins are fused into their batch rows via
# _twin, so e.g. streaming_turns_join is verified inside turns_join_tool_calls)
QUERIES = [
    "hll_distinct",
    "streaming_multi_window",
    "query_latest_cm",
    "turns_join_tool_calls",
    "query_latest_stratified",
    "session_synopses",
    "wavelet_window_sums",
    "windowed_topk_tools",
    # round-5 fused rows: CEP strict+relaxed under a variant tag, the
    # 3-way doc profile, and the composed cleaning flagship
    "pattern_matches",
    "doc_profile",
    "clean_corpus",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def duck(entry_mod):
    import duckdb

    con = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(entry_mod, duck, name):
    qs, sql = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](SF)
    g = got.to_pandas() if hasattr(got, "to_pandas") else got
    o = duck.execute(sql[name]).df()
    cols = sorted(g.columns)
    assert cols == sorted(o.columns)
    g = g[cols].sort_values(cols).reset_index(drop=True)
    o = o[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(o), f"{len(g)} vs {len(o)} rows"
    for c in cols:
        a, b = g[c].values, o[c].values
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            assert np.allclose(a.astype(float), b.astype(float), rtol=1e-9), c
        else:
            assert (a == b).all(), c
