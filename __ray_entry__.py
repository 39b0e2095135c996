"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in condor_ray) calls
``ray.init`` / ``ray.shutdown``.  Each ``queries()[name](sf_dir)`` pairs with
``oracle_sql()[name]`` run by DuckDB over the same parquet tables; column
names/aliases match exactly (the driver sorts columns by name and hashes
values).  Synopsis pipelines whose outputs are estimates (not SQL-expressible)
omit the oracle and get the weaker rows-only check.

The engine's primary input shape is the transcripts table (BASELINE
input_hint).  Driver tables carry no transcripts, so the ``events`` table is
deterministically adapted to transcripts shape on BOTH sides (Ray:
condor_ray.sources.events_adapter; SQL: the same derivation as a CTE) — every
windowed result downstream is therefore checkable end-to-end, including
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

WINDOW_MS = 6 * 3600 * 1000  # 6 h tumbling over the ~30-day events span
_W_US = WINDOW_MS * 1000

_TRANSCRIPTS_CTE = None


def _transcripts_cte() -> str:
    global _TRANSCRIPTS_CTE
    if _TRANSCRIPTS_CTE is None:
        from condor_ray.sources.events_adapter import TRANSCRIPTS_FROM_EVENTS_SQL

        _TRANSCRIPTS_CTE = f"WITH transcripts AS (\n{TRANSCRIPTS_FROM_EVENTS_SQL}\n)"
    return _TRANSCRIPTS_CTE


def entry() -> Any:
    """Flagship pipeline on sf0.001: HLL-per-window distinct conversations."""
    from condor_ray.pipelines.core import flagship_hll_pipeline
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events("/root/testdata/sf0.001")
    return flagship_hll_pipeline(ds, TumblingWindow(WINDOW_MS))


def _q_transcripts(sf_dir: str):
    from condor_ray.sources.events_adapter import transcripts_from_events

    return transcripts_from_events(sf_dir)


def _q_sliding_windowed_counts(sf_dir: str):
    """Sliding 12h / slide 6h counts via the slice-based batch engine."""
    import numpy as np
    import pandas as pd

    from condor_ray.config import BuildConfiguration, KeySpec
    from condor_ray.engine.batch import build_windowed_synopses
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import SlidingWindow

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(1024, 3, 7),
        windows=[SlidingWindow(2 * WINDOW_MS, WINDOW_MS)],
        key=KeySpec("conv_id", "java_hash"),
    )
    syn = build_windowed_synopses(
        transcripts_from_events(sf_dir), cfg, concurrency=2
    ).to_pandas()
    return pd.DataFrame(
        {
            "window_start": syn["window_start"].astype(np.int64),
            "window_end": syn["window_end"].astype(np.int64),
            "n_rows": syn["n_rows"].astype(np.int64),
        }
    )


def _q_windowed_counts(sf_dir: str):
    from condor_ray.engine.batch import windowed_counts
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_counts(ds, TumblingWindow(WINDOW_MS))


def _q_windowed_counts_by_role(sf_dir: str):
    from condor_ray.engine.batch import windowed_counts
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_counts(ds, TumblingWindow(WINDOW_MS), stratify_by="role")


def _q_windowed_distinct(sf_dir: str):
    from condor_ray.pipelines.core import windowed_distinct_convs
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_distinct_convs(ds, TumblingWindow(WINDOW_MS))


def _q_cm_tool_frequencies(sf_dir: str):
    from condor_ray.pipelines.core import cm_tool_frequencies
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return cm_tool_frequencies(ds, TumblingWindow(WINDOW_MS))


def _q_windowed_topk_tools(sf_dir: str):
    """Exact per-window top-5 tool frequencies (windowed heavy hitters) —
    ties (n DESC, tool ASC); QUALIFY row_number twin."""
    from condor_ray.pipelines.core import windowed_topk_tools
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    return windowed_topk_tools(
        transcripts_from_events(sf_dir), TumblingWindow(WINDOW_MS), k=5
    )


def _q_streaming_windowed_topk(sf_dir: str):
    from condor_ray.pipelines.synopsis_queries import streaming_windowed_topk_tools
    from condor_ray.windows import TumblingWindow

    return streaming_windowed_topk_tools(sf_dir, TumblingWindow(WINDOW_MS), k=5)


def _q_flagship_hll(sf_dir: str):
    from condor_ray.pipelines.core import flagship_hll_pipeline
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return flagship_hll_pipeline(ds, TumblingWindow(WINDOW_MS))


SESSION_GAP_MS = 30 * 60 * 1000  # 30 min session gap
COUNT_WINDOW = 500  # rows per count window


def _q_sessions(sf_dir: str):
    from condor_ray.pipelines.sessions import session_stats
    from condor_ray.sources.events_adapter import transcripts_from_events

    return session_stats(transcripts_from_events(sf_dir), SESSION_GAP_MS)


def _q_session_synopses(sf_dir: str):
    """Synopsis per (conversation, session window).  ``n_rows`` is read from
    the synopsis payload's own ``elements_processed`` (not the input frame),
    so the gaps-and-islands oracle verifies each session synopsis ingested
    exactly its session's turns."""
    import numpy as np
    import pandas as pd

    from condor_ray.pipelines.sessions import session_synopses
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.synopses.base import Synopsis

    out = session_synopses(
        transcripts_from_events(sf_dir), gap_ms=SESSION_GAP_MS
    ).to_pandas()
    ingested = [
        int(Synopsis.from_bytes(b).elements_processed) for b in out["payload"]
    ]
    return pd.DataFrame(
        {
            "conv_id": out["conv_id"],
            "session_start": out["session_start"].astype(np.int64),
            "session_end": out["session_end"].astype(np.int64),
            "n_rows": np.asarray(ingested, dtype=np.int64),
        }
    )


def _q_streaming_sessions(sf_dir: str):
    from condor_ray.pipelines.core import streaming_sessions

    return streaming_sessions(sf_dir, SESSION_GAP_MS)


def _q_count_window_distinct(sf_dir: str):
    from condor_ray.pipelines.sessions import count_window_distinct

    return count_window_distinct(sf_dir, COUNT_WINDOW)


def _q_turns_join_tool_calls(sf_dir: str):
    from condor_ray.pipelines.core import tool_calls_from_transcripts
    from condor_ray.pipelines.join import join_turns_tool_calls
    from condor_ray.sources.events_adapter import transcripts_from_events

    # one derivation: the adapter ends in an eager task exchange, so the
    # returned Dataset is reusable refs — deriving twice would re-run the
    # events read + user_id exchange (the most expensive stage of this row)
    turns = transcripts_from_events(sf_dir)
    calls = tool_calls_from_transcripts(turns)
    return join_turns_tool_calls(turns, calls, bound_ms=5_000)


def _q_asof_user_context(sf_dir: str):
    """Generic as-of join: each tool turn joins the LATEST user turn of its
    conversation at-or-before its ts (ties: greatest (ts, turn_idx));
    unmatched rows surface -1.  Partitioned merge_asof, no broadcast."""
    import pandas as pd
    import pyarrow.compute as pc

    from condor_ray.pipelines.temporal_join import asof_join
    from condor_ray.sources.events_adapter import transcripts_from_events

    turns = transcripts_from_events(sf_dir)  # eager exchange — derive once
    tool_turns = turns.map_batches(
        lambda b: b.filter(pc.is_valid(b["tool"])), batch_format="pyarrow"
    )
    user_turns = turns.map_batches(
        lambda b: b.filter(pc.equal(b["role"], "user")), batch_format="pyarrow"
    )
    out = asof_join(
        tool_turns,
        user_turns,
        left_cols={"turn_idx": "turn_idx"},
        right_cols={"user_ts": "ts", "user_turn": "turn_idx"},
        right_order=("user_turn",),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "ts_us": df["ts_us"].astype("int64"),
                "turn_idx": df["turn_idx"].astype("int64"),
                "user_ts": df["user_ts"].fillna(-1).astype("int64"),
                "user_turn": df["user_turn"].fillna(-1).astype("int64"),
            }
        )

    return out.map_batches(finalize, batch_format="pandas")


def _q_session_interval_join(sf_dir: str):
    """Point-in-interval join: each tool turn lands in its (conv, 30 m gap)
    session — one as-of exchange plus a containment filter, never a range
    cross product."""
    import pandas as pd
    import pyarrow.compute as pc

    from condor_ray.pipelines.sessions import session_stats
    from condor_ray.pipelines.temporal_join import interval_join
    from condor_ray.sources.events_adapter import transcripts_from_events

    turns = transcripts_from_events(sf_dir)  # eager exchange — derive once
    tool_turns = turns.map_batches(
        lambda b: b.filter(pc.is_valid(b["tool"])), batch_format="pyarrow"
    )
    sessions = session_stats(turns, SESSION_GAP_MS)
    out = interval_join(
        tool_turns,
        sessions,
        point_cols={"turn_idx": "turn_idx"},
        interval_cols={"session_idx": "session_idx"},
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "ts_us": df["ts_us"].astype("int64"),
                "turn_idx": df["turn_idx"].astype("int64"),
                "session_idx": df["session_idx"].astype("int64"),
                "session_start": df["session_start"].astype("int64"),
                "session_end": df["session_end"].astype("int64"),
            }
        )

    return out.map_batches(finalize, batch_format="pandas")


def _q_streaming_asof_user_context(sf_dir: str):
    from condor_ray.pipelines.core import streaming_asof_user_context

    return streaming_asof_user_context(sf_dir)


def _q_streaming_turns_join(sf_dir: str):
    from condor_ray.pipelines.core import streaming_turns_join

    return streaming_turns_join(sf_dir, bound_ms=5_000)


def _q_streaming_multi_window(sf_dir: str):
    from condor_ray.pipelines.core import streaming_multi_window_counts

    return streaming_multi_window_counts(sf_dir, WINDOW_MS)


def _q_streaming_ten_windows(sf_dir: str):
    """10 concurrent sliding windows (size i*6h, slide 6h) sharing one slice
    store — window-count stress parity with the reference's 100-window
    benchmark shape (bench:windowing/Bucketing.java:57-61), oracle-checked
    at n=10; the wall-vs-n sweep to n=100 runs in bench.py."""
    from condor_ray.pipelines.core import streaming_n_window_counts

    return streaming_n_window_counts(sf_dir, WINDOW_MS, n_windows=10)


def _q_streaming_concurrent_windows(sf_dir: str):
    """One gate row for concurrent-window support: the mixed-kind run
    (tumbling + sliding sharing one slice store) UNION the n=10 sliding
    stress run — distinct ``window_kind`` labels keep the two result sets
    disjoint, so one UNION ALL oracle checks both."""
    import pandas as pd

    def frame(res):
        return res.to_pandas() if hasattr(res, "to_pandas") else res

    return pd.concat(
        [frame(_q_streaming_multi_window(sf_dir)),
         frame(_q_streaming_ten_windows(sf_dir))],
        ignore_index=True,
    )


def _q_cm_asof_queries(sf_dir: str):
    """queryTimestamped evaluation: every tool turn queries its own tool's
    frequency at its own timestamp; collision-free CM => exact counts."""
    import pandas as pd
    import pyarrow.compute as pc

    from condor_ray.engine.batch import build_windowed_synopses
    from condor_ray.config import BuildConfiguration, KeySpec
    from condor_ray.evaluate.queries import query_timestamped, query_count_min
    from condor_ray.hashing import java_string_hash_arrow
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[TumblingWindow(WINDOW_MS)],
        key=KeySpec("tool", "java_hash"),
    )
    tool_rows = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tool"])), batch_format="pyarrow"
    )
    syn = build_windowed_synopses(tool_rows, cfg, concurrency=2)

    def to_queries(t):
        import pyarrow as pa

        t = t.filter(pc.is_valid(t["tool"]))
        return pa.table(
            {
                "query_key": pa.array(java_string_hash_arrow(t["tool"])),
                "query_ts": t["ts"],
                "tool": t["tool"],
            }
        )

    queries = ds.map_batches(to_queries, batch_format="pyarrow")
    out = query_timestamped(queries, syn, query_count_min).to_pandas()
    return pd.DataFrame(
        {
            "tool": out["tool"],
            "query_ts": out["query_ts"].astype("int64"),
            "window_start": out["window_start"].astype("int64"),
            "est": out["result"].astype("int64"),
        }
    )


def _q_streaming_cm_asof(sf_dir: str):
    """Continuous queryTimestamped (bounded-archive broadcast operator,
    QueryTimestampedFunction.java:31-97) over the live streaming CM job;
    equals batch queryTimestamped on bounded input, sharing its oracle."""
    from condor_ray.pipelines.synopsis_queries import streaming_cm_asof
    from condor_ray.windows import TumblingWindow

    return streaming_cm_asof(sf_dir, TumblingWindow(WINDOW_MS))


def _q_cm_asof_stratified(sf_dir: str):
    """queryTimestampedStratified: CM per (window, role stratum) keyed by
    turn_idx; every turn queries its own (role, turn_idx) frequency as of its
    own timestamp.  Probe universe (20 turn indices vs width 65536, min over
    5 rows) is collision-free in practice => estimates equal GROUP BY counts."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from condor_ray.engine.batch import build_windowed_synopses
    from condor_ray.config import BuildConfiguration, KeySpec
    from condor_ray.evaluate.queries import (
        query_count_min,
        query_timestamped_stratified,
    )
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[TumblingWindow(WINDOW_MS)],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2)

    def to_queries(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["turn_idx"], 20))
        return pa.table(
            {
                "query_key": t["turn_idx"].cast(pa.int32()),
                "query_ts": t["ts"],
                "stratum": t["role"],
            }
        )

    queries = ds.map_batches(to_queries, batch_format="pyarrow")
    out = query_timestamped_stratified(queries, syn, query_count_min).to_pandas()
    return pd.DataFrame(
        {
            "stratum": out["stratum"],
            "turn_probe": out["query_key"].astype("int64"),
            "query_ts": out["query_ts"].astype("int64"),
            "window_start": out["window_start"].astype("int64"),
            "est": out["result"].astype("int64"),
        }
    )


def _q_streaming_cm_asof_stratified(sf_dir: str):
    """Continuous stratified queryTimestamped (per-stratum bounded archive,
    QueryStratifiedTimestampedFunction.java:30-96) over the stratified
    streaming job; equals batch on bounded input, sharing its oracle."""
    from condor_ray.pipelines.synopsis_queries import streaming_cm_asof_stratified
    from condor_ray.windows import TumblingWindow

    return streaming_cm_asof_stratified(sf_dir, TumblingWindow(WINDOW_MS))


def _q_streaming_windowed_counts(sf_dir: str):
    from condor_ray.pipelines.core import streaming_windowed_counts
    from condor_ray.windows import TumblingWindow

    return streaming_windowed_counts(sf_dir, TumblingWindow(WINDOW_MS))


def _q_wavelet_window_sums(sf_dir: str):
    from condor_ray.pipelines.core import wavelet_window_sums
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    return wavelet_window_sums(
        transcripts_from_events(sf_dir), TumblingWindow(WINDOW_MS)
    )


def _q_streaming_wavelet_sums(sf_dir: str):
    from condor_ray.pipelines.core import streaming_wavelet_sums
    from condor_ray.windows import TumblingWindow

    return streaming_wavelet_sums(sf_dir, TumblingWindow(WINDOW_MS))


def _q_fifo_newest_ts(sf_dir: str):
    from condor_ray.pipelines.core import fifo_newest_ts
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    return fifo_newest_ts(
        transcripts_from_events(sf_dir), TumblingWindow(WINDOW_MS), k=5
    )


def _q_count_window_tool_freq(sf_dir: str):
    from condor_ray.pipelines.core import count_window_tool_frequencies

    return count_window_tool_frequencies(sf_dir, size=COUNT_WINDOW)


def _q_streaming_count_window(sf_dir: str):
    from condor_ray.pipelines.core import streaming_count_window_tool_freq

    return streaming_count_window_tool_freq(sf_dir, size=COUNT_WINDOW)


def _q_exact_dedup(sf_dir: str):
    import ray.data as rd

    from condor_ray.pipelines.dedup import exact_dedup, with_planted_duplicates

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(with_planted_duplicates(docs))


def _q_top_words(sf_dir: str):
    """Exact corpus-wide top-100 word frequencies over documents (per-batch
    partial counts -> hash-partitioned sum + per-part top-k -> tiny merge)."""
    import ray.data as rd

    from condor_ray.pipelines.textstats import top_k_words

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_k_words(docs, k=100)


def _q_heavy_hitters(sf_dir: str):
    """Count-Min-powered approximate top-100 words; with width (65536) >>
    vocabulary the estimates are exact, so it shares top_words' oracle."""
    import ray.data as rd

    from condor_ray.pipelines.textstats import heavy_hitters_cm

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitters_cm(docs, k=100)


def _q_dup_components(sf_dir: str):
    """Dedup clustering: near-dup pair graph -> connected components ->
    per-doc keep decision (condor_ray.pipelines.graph).

    The corpus plants copies at two offsets (d%7 -> d+1e7, d%3 -> d+2e7), so
    d%21 docs form 3-member clusters.  Pairs are emitted as a CHAIN through
    each duplicate group (consecutive ids, not all-pairs), which forces the
    distributed min-label propagation to walk multiple hops — the SQL twin
    can still derive the same components because same-text happens to be
    transitive (the Ray operator does not rely on that)."""
    import pyarrow as pa
    import ray.data as rd

    from condor_ray.pipelines.dedup import _bucket_pair_stage, content_hash_stage
    from condor_ray.pipelines.graph import dedup_keep_list

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy() if isinstance(
            batch["doc_id"], pa.ChunkedArray
        ) else batch["doc_id"].to_numpy()
        parts = [batch]
        for every, offset in ((7, 10_000_000), (3, 20_000_000)):
            dup = batch.filter(pa.array(ids % every == 0))
            dup = dup.set_column(
                dup.schema.get_field_index("doc_id"),
                "doc_id",
                pa.compute.add(dup["doc_id"], offset),
            )
            parts.append(dup)
        return pa.concat_tables(parts)

    corpus = docs.map_batches(plant, batch_format="pyarrow").materialize()
    n_parts = 16

    # bucket_cap=1 => every duplicate group emits a chain through its
    # sorted ids (multi-hop), not all-pairs
    pairs = (
        corpus.map_batches(content_hash_stage(n_parts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            _bucket_pair_stage(("h1", "h2"), bucket_cap=1),
            batch_format="pandas",
        )
    )
    return dedup_keep_list(corpus, pairs, n_parts=n_parts)



def _head_embeddings(sf_dir: str, n: int = 10):
    """The first ``n`` query vectors WITHOUT pulling the whole embeddings
    table into the driver — only the first record batch leaves storage
    (shared by ann_topk / ivf_topk, which previously each read the full
    table to keep 10 rows)."""
    import numpy as np
    import pyarrow.parquet as pq

    import pyarrow as pa

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    got, rows = 0, []
    # iter_batches never spans row groups — accumulate in case the file's
    # first row group is shorter than n (read_table().slice(0, n) crossed
    # row-group boundaries; keep that contract)
    for b in pf.iter_batches(batch_size=n, columns=["vec_id", "embedding"]):
        rows.append(b)
        got += b.num_rows
        if got >= n:
            break
    head = pa.Table.from_batches(rows).slice(0, n)
    qv = np.stack(head["embedding"].to_pylist()).astype(np.float64)
    qid = head["vec_id"].to_numpy()
    return qv, qid


def _q_ann_topk(sf_dir: str):
    import ray.data as rd

    from condor_ray.pipelines.similarity import brute_force_topk

    qv, qid = _head_embeddings(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(ds, qv, qid, k=10)


def _q_ivf_topk(sf_dir: str):
    """IVF ANN in EXHAUSTIVE-probe mode (n_probe == n_centroids): must equal
    brute force exactly, so it shares the ann_topk SQL oracle — a hash match
    verifies the whole IVF machinery (train, cell assign, per-cell search,
    merge).  Approximate-mode recall is covered by pytest."""
    import ray.data as rd

    from condor_ray.pipelines.similarity import ivf_topk

    qv, qid = _head_embeddings(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(ds, qv, qid, k=10, n_centroids=16, n_probe=16)


def _q_minhash_dedup_keep(sf_dir: str):
    """End-to-end near-dup dedup: MinHash-LSH pairs -> connected components
    -> one kept representative per cluster (rows-only: LSH pair sets are
    not SQL-expressible; the clustering step alone is oracle-backed via
    ``dup_components``)."""
    import ray.data as rd

    from condor_ray.pipelines.dedup import minhash_lsh_pairs
    from condor_ray.pipelines.graph import dedup_keep_list

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    return dedup_keep_list(
        docs.select_columns(["doc_id"]), pairs, n_parts=16
    )


def _q_simhash_neardup(sf_dir: str):
    import ray.data as rd

    from condor_ray.pipelines.dedup import simhash_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # bands=8 > max_hamming -> pigeonhole recall guarantee
    return simhash_pairs(docs, max_hamming=6, bands=8)


def _q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup over the embeddings table with one planted
    exact duplicate per 100 vectors (deterministic) — every planted pair must
    surface at threshold 0.999 (identical vectors share all LSH tables).
    Rows-only: LSH pair sets are not SQL-expressible."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from condor_ray.pipelines.similarity import embedding_neardup_pairs

    # collision-free at any scale factor (a fixed +1e6 would collide with
    # real vec_ids once the table reaches 1M rows).  Only the 8-byte id
    # column touches the driver — duplicates are planted per batch inside
    # map_batches (the full-table to_pandas + from_pandas this replaced
    # held every vector on the driver and emitted ONE block).
    id_step = (
        int(
            pc.max(
                pq.read_table(
                    f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
                )["vec_id"]
            ).as_py()
        )
        + 1
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        dup = batch.filter(pa.array(ids.to_numpy() % 100 == 0))
        dup = dup.set_column(
            dup.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(dup["vec_id"], id_step),
        )
        return pa.concat_tables([batch, dup])

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        plant, batch_format="pyarrow"
    )
    pairs = embedding_neardup_pairs(ds, threshold=0.999)

    def check(batch):
        # planted membership is arithmetic: a real id (< id_step) divisible
        # by 100 whose partner is its +id_step copy
        a = batch["vec_a"].to_numpy()
        found = (
            (a % 100 == 0)
            & (a < id_step)
            & (batch["vec_b"].to_numpy() == a + id_step)
        )
        return batch.append_column("is_planted", pa.array(found))

    return pairs.map_batches(check, batch_format="pyarrow")


def _q_streaming_query_latest_stratified(sf_dir: str):
    """Continuous stratified queryLatest over the streaming engine's
    stratified path (QueryLatestStratifiedFunction.java:28-88); equals
    batch queryLatestStratified on bounded input, sharing its oracle."""
    from condor_ray.pipelines.synopsis_queries import (
        streaming_query_latest_stratified,
    )
    from condor_ray.windows import TumblingWindow

    return streaming_query_latest_stratified(sf_dir, TumblingWindow(WINDOW_MS))


def _q_streaming_query_latest(sf_dir: str):
    """Standing query set evaluated per close cycle inside the streaming CM
    job (continuous queryLatest); the final cycle equals batch queryLatest,
    sharing its SQL oracle."""
    from condor_ray.pipelines.synopsis_queries import streaming_query_latest_cm
    from condor_ray.windows import TumblingWindow

    return streaming_query_latest_cm(sf_dir, TumblingWindow(WINDOW_MS))



def _q_jaccard_verify(sf_dir: str):
    """Distributed exact n-gram Jaccard over candidate pairs (the verify
    stage of near-dup dedup), on a corpus with planted near-duplicates:
    every 10th doc reappears with a ' planted tail' suffix (high Jaccard),
    and (d, d+1) pairs for d % 7 == 0 are unrelated docs (low Jaccard).
    The SQL twin computes string-trigram set Jaccard with list lambdas."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from condor_ray.pipelines.dedup import jaccard_verify_pairs

    ids = np.sort(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
    )
    step = int(ids.max()) + 1
    dups = ids[ids % 10 == 0]
    near = ids[(ids % 7 == 0) & np.isin(ids + 1, ids)]
    pairs = pd.DataFrame(
        {
            "doc_a": np.concatenate([dups, near]).astype(np.int64),
            "doc_b": np.concatenate([dups + step, near + 1]).astype(np.int64),
        }
    )

    def plant(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        dup = batch.filter(pa.array(d % 10 == 0))
        dup = dup.set_column(
            dup.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(dup["doc_id"], step),
        )
        dup = dup.set_column(
            dup.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(
                dup["text"].cast(pa.string()), " planted tail", ""
            ),
        )
        return pa.concat_tables([batch, dup])

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(plant, batch_format="pyarrow")
    return jaccard_verify_pairs(docs, pairs)



def _q_doc_fingerprints(sf_dir: str):
    import ray.data as rd

    from condor_ray.pipelines.textstats import document_fingerprints

    return document_fingerprints(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


PATTERN_WITHIN_MS = 24 * 3600 * 1000  # 24 h span bound rejects ~1/3 of raw hits


def _pattern_steps():
    from condor_ray.pipelines.cep import Step

    return [
        Step("role", "eq", "user"),
        Step("tool", "notnull"),
        Step("role", "eq", "assistant"),
    ]


def _q_pattern_matches(sf_dir: str):
    """CEP: strict-contiguity 3-step pattern (user turn -> tool call ->
    assistant turn on consecutive turns of one conversation, first-to-last
    span <= 24 h) — the lead()-window SQL twin checks it exactly."""
    from condor_ray.pipelines.cep import match_pattern
    from condor_ray.sources.events_adapter import transcripts_from_events

    return match_pattern(
        transcripts_from_events(sf_dir),
        _pattern_steps(),
        within_ms=PATTERN_WITHIN_MS,
    )


def _q_pattern_matches_relaxed(sf_dir: str):
    """CEP followedBy (skip-till-next-match): from each user turn, the
    nearest later tool call, then the nearest assistant turn after that —
    within 24 h.  The SQL twin chains windowed next-match indices through
    self-joins."""
    from condor_ray.pipelines.cep import match_pattern_relaxed
    from condor_ray.sources.events_adapter import transcripts_from_events

    return match_pattern_relaxed(
        transcripts_from_events(sf_dir),
        _pattern_steps(),
        within_ms=PATTERN_WITHIN_MS,
    )


def _q_streaming_pattern_matches(sf_dir: str):
    from condor_ray.pipelines.core import streaming_pattern_matches

    return streaming_pattern_matches(
        sf_dir, _pattern_steps(), within_ms=PATTERN_WITHIN_MS
    )


def _q_streaming_pattern_matches_relaxed(sf_dir: str):
    from condor_ray.pipelines.core import streaming_pattern_matches

    return streaming_pattern_matches(
        sf_dir, _pattern_steps(), within_ms=PATTERN_WITHIN_MS,
        contiguity="relaxed",
    )


def _q_doc_profile(sf_dir: str):
    """token_stats + bpe_token_stats + quality_scores + language_id +
    word_rarity_scores over ``documents`` in one gate row: all five REAL
    streaming operators run, their tiny per-doc profile frames merge on
    doc_id driver-side (documents ≤ 5k rows at gate scale; the operators
    themselves stream — word_rarity's corpus pass rides the task hash
    exchange).  Oracle: the five bit-identical twins joined on doc_id
    (rarity keeps only its integer sums; its n_words duplicates
    quality's)."""
    import ray.data as rd

    from condor_ray.pipelines.textstats import (
        bpe_token_stats,
        language_id,
        quality_scores,
        token_stats,
        word_rarity_scores,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    prof = token_stats(docs).to_pandas()
    prof = prof.merge(bpe_token_stats(docs).to_pandas(), on="doc_id")
    prof = prof.merge(quality_scores(docs).to_pandas(), on="doc_id")
    prof = prof.merge(language_id(docs).to_pandas(), on="doc_id")
    rarity = word_rarity_scores(docs).to_pandas()
    return prof.merge(
        rarity[["doc_id", "rarity_sum", "min_count"]], on="doc_id"
    )


def _variant_union(**variants: Callable[[str], Any]):
    """Run each variant query and stack the results under a ``variant``
    tag column — fuses same-shape operator variants (e.g. CEP strict vs
    relaxed contiguity) into one gate row whose oracle is the UNION ALL
    of the per-variant twins."""

    def run(sf_dir: str):
        import pandas as pd

        frames = []
        for tag, fn in variants.items():
            df = fn(sf_dir)
            if hasattr(df, "to_pandas") and not isinstance(df, pd.DataFrame):
                df = df.to_pandas()
            df = df.copy()
            df.insert(0, "variant", tag)
            frames.append(df)
        return pd.concat(frames, ignore_index=True)

    return run


def _q_corpus_filters(sf_dir: str):
    """The fused one-pass scrub/filter signals operator (C4 line filter +
    PII redaction + Gopher repetition) over ``documents``."""
    import ray.data as rd

    from condor_ray.pipelines.textstats import corpus_filters

    return corpus_filters(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def _q_decontam_docs(sf_dir: str):
    """Eval-set decontamination: the 13-word-gram rule with the benchmark
    side a small slice of ``documents`` (doc_id % 101 = 7 — the realistic
    shape: tiny driver-resident eval set, streaming corpus).  Oracle: the
    string-gram join twin."""
    import pandas as pd
    import ray.data as rd

    from condor_ray.pipelines.dedup import decontaminate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bench = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bench = bench[bench["doc_id"] % 101 == 7]
    return decontaminate(docs, bench)


# clean_corpus gate derivation, shared between the Ray side and the SQL
# oracle: the synthetic documents carry no terminal punctuation (the C4
# line rule would drop everything), so both sides append one '.' per doc
# and plant exact duplicates for the dedup stage — the same UNION-style
# derivation the exact_dedup row uses.
_CLEAN_CORPUS_TABLE = (
    "(SELECT doc_id, text || '.' AS text FROM documents "
    "UNION ALL "
    "SELECT doc_id + 100000, text || '.' FROM documents WHERE doc_id % 7 = 0)"
)


def _q_clean_corpus(sf_dir: str):
    """The composed corpus-cleaning flagship through every stage: C4 line
    filter -> PII redaction -> fused quality/repetition/decontamination
    gate -> exact dedup keeping text.  Runs over the derived corpus above
    (terminal '.', planted duplicate docs); the benchmark is the derived
    corpus's doc_id % 101 = 7 slice."""
    import pyarrow.compute as pc
    import ray.data as rd

    from condor_ray.pipelines.clean import clean_corpus

    def dot(batch):
        return batch.set_column(
            batch.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(
                batch["text"].cast("string"), ".", ""
            ),
        )

    def shift(batch):
        mask = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        kept = batch.filter(mask)
        return kept.set_column(
            kept.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(kept["doc_id"], 100000),
        )

    base = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(dot, batch_format="pyarrow")
    corpus = base.union(base.map_batches(shift, batch_format="pyarrow"))

    def bench_slice(batch):
        mask = (batch["doc_id"].to_numpy(zero_copy_only=False) % 101) == 7
        return batch.filter(mask)

    bench = corpus.map_batches(bench_slice, batch_format="pyarrow")
    return clean_corpus(corpus, bench)


def _mk_synopsis_query(fn_name: str):
    """Factory: synopsis_queries.<fn_name>(transcripts, 6h tumbling)."""

    def runner(sf_dir: str):
        from condor_ray.pipelines import synopsis_queries as sq
        from condor_ray.sources.events_adapter import transcripts_from_events
        from condor_ray.windows import TumblingWindow

        fn = getattr(sq, fn_name)
        return fn(transcripts_from_events(sf_dir), TumblingWindow(WINDOW_MS))

    return runner


def _q_image_features(sf_dir: str):
    import ray.data as rd

    from condor_ray.pipelines.multimodal import decode_images, synthesize_image_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_images(synthesize_image_table(docs))


def _q_frame_samples(sf_dir: str):
    """Video-style frame sampling over the synthetic binary payloads: every
    4th 256-byte frame's checksum through the actor-pool sampler.  The
    payloads are deterministic functions of (doc_id, text), so the whole
    binary pipeline — synthesize -> shard -> sample — is SQL-checkable."""
    import ray.data as rd

    from condor_ray.pipelines.multimodal import sample_frames, synthesize_image_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return sample_frames(synthesize_image_table(docs))


def _q_audio_features(sf_dir: str):
    """Real RIFF/PCM WAV decode through the actor-pool audio stage: the
    synthetic payloads store int16 words v_i = (doc_id*31 + i*17) % 65535
    - 32767 exactly, so sum_sq / peak_abs / n_frames are integer-exact and
    the SQL twin regenerates the samples with generate_series."""
    import ray.data as rd

    from condor_ray.pipelines.multimodal import decode_audio, synthesize_audio_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return decode_audio(synthesize_audio_table(docs))


def _canon_frame(res):
    """The driver gate's canonical form: pandas, columns sorted by NAME,
    rows sorted by all values."""
    import pandas as pd

    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()  # pyarrow.Table
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _twin(batch_fn: Callable[[str], Any], streaming_fn: Callable[[str], Any]):
    """Fuse a batch/streaming pair that shares one SQL oracle into ONE gate
    row: run BOTH engines, assert they produce identical canonical frames
    (so a streaming-path regression turns the row red even though only the
    batch result is hashed), and return the batch result.  This is how all
    60 distinct oracles fit inside the driver gate's 50-row cap while every
    engine path stays officially verified."""

    def run(sf_dir: str):
        import pandas as pd

        # materialize the batch result ONCE: returning the lazy Dataset
        # would make the gate re-execute the whole batch plan a second
        # time when it hashes the row
        batch = batch_fn(sf_dir)
        if hasattr(batch, "to_pandas") and not isinstance(batch, pd.DataFrame):
            batch = batch.to_pandas()
        streaming = streaming_fn(sf_dir)
        a, b = _canon_frame(batch), _canon_frame(streaming)
        if list(a.columns) != list(b.columns):
            raise AssertionError(
                f"batch/streaming column mismatch: {list(a.columns)} vs "
                f"{list(b.columns)}"
            )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return batch

    return run


def queries() -> dict[str, Callable[[str], Any]]:
    """Exactly 50 entries — the driver's correctness gate records the first
    50 only, so the registry is sized to it.  Every batch/streaming pair
    that shares a SQL oracle is fused into one dual-engine row via
    ``_twin`` (both engines run; bit-equality asserted; shared oracle
    hashes the result), so all 50 rows are officially gated and the
    13 streaming twins remain verified INSIDE their rows.  The four
    rows-only entries (LSH pair sets, HLL estimates — no SQL oracle by
    nature) now also fit in-gate and get official rows-only checks."""
    return {
        # --- transcripts + tumbling/sliding/stratified windows -------------
        "transcripts_derivation": _q_transcripts,
        "windowed_counts": _twin(_q_windowed_counts, _q_streaming_windowed_counts),
        "sliding_windowed_counts": _q_sliding_windowed_counts,
        "windowed_counts_by_role": _q_windowed_counts_by_role,
        "windowed_distinct_convs": _q_windowed_distinct,
        "cm_tool_frequencies": _q_cm_tool_frequencies,
        "windowed_topk_tools": _twin(_q_windowed_topk_tools, _q_streaming_windowed_topk),
        # --- session + count windows ---------------------------------------
        "sessions_30m": _twin(_q_sessions, _q_streaming_sessions),
        "session_synopses": _q_session_synopses,
        "count_window_distinct": _q_count_window_distinct,
        "count_window_tool_freq": _twin(
            _q_count_window_tool_freq, _q_streaming_count_window
        ),
        # --- CEP (strict + relaxed contiguity fused under a variant tag;
        # each variant remains a batch/streaming _twin) ------------------------
        "pattern_matches": _twin(
            _variant_union(
                strict=_q_pattern_matches, relaxed=_q_pattern_matches_relaxed
            ),
            _variant_union(
                strict=_q_streaming_pattern_matches,
                relaxed=_q_streaming_pattern_matches_relaxed,
            ),
        ),
        # --- joins + concurrent windows --------------------------------------
        "turns_join_tool_calls": _twin(
            _q_turns_join_tool_calls, _q_streaming_turns_join
        ),
        "asof_user_context": _twin(
            _q_asof_user_context, _q_streaming_asof_user_context
        ),
        "session_interval_join": _q_session_interval_join,
        # mixed-kind (tumbling+sliding) + n=10 sliding windows in one row (UNION
        # oracle; distinct window_kind labels keep the result sets disjoint)
        "streaming_multi_window": _q_streaming_concurrent_windows,
        # --- evaluators (queryLatest / queryTimestamped, batch + continuous) -
        "cm_asof_queries": _twin(_q_cm_asof_queries, _q_streaming_cm_asof),
        "cm_asof_stratified": _twin(
            _q_cm_asof_stratified, _q_streaming_cm_asof_stratified
        ),
        "query_latest_cm": _twin(
            _mk_synopsis_query("query_latest_cm"), _q_streaming_query_latest
        ),
        "query_latest_stratified": _twin(
            _mk_synopsis_query("query_latest_stratified_cm"),
            _q_streaming_query_latest_stratified,
        ),
        # --- wavelets (order-based) ------------------------------------------
        "wavelet_window_sums": _twin(
            _q_wavelet_window_sums, _q_streaming_wavelet_sums
        ),
        # --- the twelve synopses ---------------------------------------------
        "fifo_newest_ts": _q_fifo_newest_ts,
        "equiwidth_hist": _mk_synopsis_query("equiwidth_hist_buckets"),
        "bloom_membership": _mk_synopsis_query("bloom_membership"),
        "cuckoo_membership": _mk_synopsis_query("cuckoo_membership"),
        "ddsketch_quantiles": _mk_synopsis_query("ddsketch_quantile_check"),
        "agms_f2": _mk_synopsis_query("agms_f2_check"),
        "reservoir_sample": _mk_synopsis_query("reservoir_window_sample"),
        "biased_reservoir_sample": _mk_synopsis_query("biased_window_sample"),
        "bash_equidepth": _mk_synopsis_query("bash_total_check"),
        "hll_distinct": _mk_synopsis_query("hll_distinct_check"),
        # --- LLM-data pipeline: dedup / text / similarity / multimodal -------
        "exact_dedup": _q_exact_dedup,
        "dup_components": _q_dup_components,
        # token_stats + quality_scores + language_id fused on doc_id
        "doc_profile": _q_doc_profile,
        "top_words": _q_top_words,
        "heavy_hitters_cm": _q_heavy_hitters,
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "jaccard_verify": _q_jaccard_verify,
        # --- quality-filter family (scrub signals, decontamination, the
        # composed cleaning flagship) -----------------------------------------
        "corpus_filters": _q_corpus_filters,
        "decontam_docs": _q_decontam_docs,
        "clean_corpus": _q_clean_corpus,
        "doc_fingerprints": _q_doc_fingerprints,
        "image_features": _q_image_features,
        "frame_samples": _q_frame_samples,
        "audio_features": _q_audio_features,
        # --- rows-only by nature (no SQL oracle): estimates / LSH pair sets --
        "flagship_hll": _q_flagship_hll,
        # minhash_dedup_keep runs the pairs pipeline internally (pairs ->
        # components -> keep list), so the former minhash_neardup row is
        # covered end-to-end inside this one
        "minhash_dedup_keep": _q_minhash_dedup_keep,
        "simhash_neardup": _q_simhash_neardup,
        "embedding_neardup": _q_embedding_neardup,
    }


def oracle_sql() -> dict[str, str]:
    cte = _transcripts_cte()
    out = {
        "transcripts_derivation": f"{cte} SELECT * FROM transcripts",
        "windowed_counts": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       (epoch_us(ts) // {_W_US}) * {_W_US} + {_W_US} AS window_end,
       count(*) AS n_rows
FROM transcripts GROUP BY 1, 2""",
        "sliding_windowed_counts": f"""{cte},
assigned AS (
  SELECT (epoch_us(ts) // {_W_US}) AS w FROM transcripts
  UNION ALL
  SELECT (epoch_us(ts) // {_W_US}) - 1 AS w FROM transcripts
)
SELECT w * {_W_US} AS window_start,
       w * {_W_US} + {2 * _W_US} AS window_end,
       count(*) AS n_rows
FROM assigned WHERE w >= 0 GROUP BY w""",
        "windowed_counts_by_role": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       (epoch_us(ts) // {_W_US}) * {_W_US} + {_W_US} AS window_end,
       role AS stratum,
       count(*) AS n_rows
FROM transcripts GROUP BY 1, 2, 3""",
        "windowed_distinct_convs": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       count(DISTINCT conv_id) AS n_convs
FROM transcripts GROUP BY 1""",
        "cm_tool_frequencies": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       tool,
       count(*) AS est
FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2""",
    }
    from condor_ray.pipelines.core import windowed_topk_sql as _wtk

    out["windowed_topk_tools"] = _wtk(cte, _W_US, 5)
    # exact per-(window, tool) counts at streaming close == batch counts
    out["sessions_30m"] = __import__(
        "condor_ray.pipelines.sessions", fromlist=["session_sql"]
    ).session_sql(cte, SESSION_GAP_MS)
    out["session_synopses"] = __import__(
        "condor_ray.pipelines.sessions", fromlist=["session_synopsis_sql"]
    ).session_synopsis_sql(cte, SESSION_GAP_MS)
    out["count_window_distinct"] = f"""
SELECT (event_id // {COUNT_WINDOW}) AS window_id,
       count(DISTINCT user_id) AS n_convs
FROM events GROUP BY 1"""
    out["turns_join_tool_calls"] = f"""{cte},
tool_calls AS (
  SELECT conv_id,
         conv_id || '_' || CAST(turn_idx AS VARCHAR) AS call_id,
         tool,
         CASE WHEN turn_idx % 10 = 0 THEN 'error' ELSE 'ok' END AS status,
         ts + to_microseconds((turn_idx % 5) * 1000000) AS ts
  FROM transcripts WHERE tool IS NOT NULL
)
SELECT t.conv_id, t.turn_idx, epoch_us(t.ts) AS turn_ts,
       c.call_id, c.tool, c.status, epoch_us(c.ts) AS call_ts
FROM transcripts t
JOIN tool_calls c
  ON t.conv_id = c.conv_id AND t.tool = c.tool
 AND epoch_us(c.ts) BETWEEN epoch_us(t.ts) AND epoch_us(t.ts) + 5000000
WHERE t.tool IS NOT NULL"""
    out["asof_user_context"] = f"""{cte}
SELECT t.conv_id, CAST(epoch_us(t.ts) AS BIGINT) AS ts_us,
       CAST(t.turn_idx AS BIGINT) AS turn_idx,
       COALESCE(u.user_ts, -1) AS user_ts,
       COALESCE(u.user_turn, -1) AS user_turn
FROM transcripts t
LEFT JOIN LATERAL (
  SELECT CAST(epoch_us(u.ts) AS BIGINT) AS user_ts,
         CAST(u.turn_idx AS BIGINT) AS user_turn
  FROM transcripts u
  WHERE u.conv_id = t.conv_id AND u.role = 'user' AND u.ts <= t.ts
  ORDER BY u.ts DESC, u.turn_idx DESC LIMIT 1
) u ON TRUE
WHERE t.tool IS NOT NULL"""
    from condor_ray.pipelines.sessions import session_sql

    out["session_interval_join"] = f"""WITH sessions AS (
{session_sql(cte, SESSION_GAP_MS)}
), {cte.removeprefix("WITH ")}
SELECT t.conv_id, CAST(epoch_us(t.ts) AS BIGINT) AS ts_us,
       CAST(t.turn_idx AS BIGINT) AS turn_idx,
       s.session_idx,
       s.session_start, s.session_end
FROM transcripts t
JOIN sessions s
  ON t.conv_id = s.conv_id
 AND epoch_us(t.ts) BETWEEN s.session_start AND s.session_end
WHERE t.tool IS NOT NULL"""
    from condor_ray.pipelines.cep import pattern_sql

    from condor_ray.pipelines.cep import pattern_relaxed_sql

    # fused CEP row: strict + relaxed under a variant tag (UNION ALL twin)
    out["pattern_matches"] = (
        f"SELECT 'strict' AS variant, * FROM "
        f"({pattern_sql(cte, _pattern_steps(), PATTERN_WITHIN_MS)}) "
        f"UNION ALL SELECT 'relaxed' AS variant, * FROM "
        f"({pattern_relaxed_sql(cte, _pattern_steps(), PATTERN_WITHIN_MS)})"
    )
    # ts-ordered fragments => incremental relaxed matching over the
    # watermark frontier emits exactly the batch followedBy match set
    # ts-ordered fragments => no late rows; incremental matching over the
    # watermark frontier emits exactly the batch match set
    from condor_ray.pipelines.core import multi_window_sql as _mwsql
    from condor_ray.pipelines.core import n_window_sql as _nwsql

    # fused row: mixed-kind (tumbling+sliding) UNION n=10 sliding (disjoint window_kind)
    out["streaming_multi_window"] = (
        f"SELECT * FROM ({_mwsql(cte, _W_US)}) "
        f"UNION ALL SELECT * FROM ({_nwsql(cte, _W_US, 10)})"
    )

    out["cm_asof_queries"] = f"""{cte},
counts AS (
  SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start, tool,
         count(*) AS est
  FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2
)
SELECT t.tool,
       epoch_us(t.ts) AS query_ts,
       (epoch_us(t.ts) // {_W_US}) * {_W_US} AS window_start,
       c.est
FROM transcripts t
JOIN counts c
  ON c.tool = t.tool AND c.window_start = (epoch_us(t.ts) // {_W_US}) * {_W_US}
WHERE t.tool IS NOT NULL"""
    # continuous timestamped evaluation converges to batch as-of on bounded
    # input (unbounded archive, all windows closed at end of stream)
    out["cm_asof_stratified"] = f"""{cte},
counts AS (
  SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start, role,
         CAST(turn_idx AS BIGINT) AS turn_probe, count(*) AS est
  FROM transcripts WHERE turn_idx < 20 GROUP BY 1, 2, 3
)
SELECT t.role AS stratum,
       CAST(t.turn_idx AS BIGINT) AS turn_probe,
       epoch_us(t.ts) AS query_ts,
       (epoch_us(t.ts) // {_W_US}) * {_W_US} AS window_start,
       c.est
FROM transcripts t
JOIN counts c
  ON c.role = t.role
 AND c.window_start = (epoch_us(t.ts) // {_W_US}) * {_W_US}
 AND c.turn_probe = t.turn_idx
WHERE t.turn_idx < 20"""
    # continuous stratified timestamped evaluation converges to batch as-of
    out["fifo_newest_ts"] = f"""{cte},
win_ts AS (
  SELECT DISTINCT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
         epoch_us(ts) AS ts_us
  FROM transcripts
),
ranked AS (
  SELECT window_start, ts_us,
         row_number() OVER (PARTITION BY window_start ORDER BY ts_us DESC) AS rn
  FROM win_ts
)
SELECT window_start, ts_us FROM ranked WHERE rn <= 5"""
    out["count_window_tool_freq"] = f"""
SELECT (event_id // {COUNT_WINDOW}) AS window_id,
       'tool_' || CAST(event_id % 20 AS VARCHAR) AS tool,
       count(*) AS est
FROM events
WHERE event_type NOT IN ('view', 'signup', 'click', 'purchase')
GROUP BY 1, 2"""
    from condor_ray.pipelines import synopsis_queries as _sq

    out["equiwidth_hist"] = _sq.equiwidth_sql(cte, _W_US)
    out["bloom_membership"] = _sq.bloom_sql(cte, _W_US)
    out["cuckoo_membership"] = _sq.cuckoo_sql(cte, _W_US)
    out["ddsketch_quantiles"] = _sq.ddsketch_sql(cte, _W_US)
    out["agms_f2"] = _sq.agms_sql(cte, _W_US)
    out["reservoir_sample"] = _sq.sample_membership_sql(cte, _W_US)
    out["biased_reservoir_sample"] = _sq.sample_membership_sql(cte, _W_US)
    out["bash_equidepth"] = _sq.bash_sql(cte, _W_US)
    out["hll_distinct"] = _sq.hll_sql(cte, _W_US)
    from condor_ray.pipelines.core import wavelet_sum_sql as _wsql

    out["wavelet_window_sums"] = _wsql(cte, _W_US)
    out["query_latest_cm"] = _sq.query_latest_sql(cte, _W_US)
    out["query_latest_stratified"] = _sq.query_latest_stratified_sql(cte, _W_US)
    out["exact_dedup"] = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM docs2 GROUP BY text"""
    out["dup_components"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 20000000, text FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY text) AS component,
       doc_id = MIN(doc_id) OVER (PARTITION BY text) AS keep
FROM corpus"""
    _token_sql = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""
    out["top_words"] = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 100"""
    # collision-free CM regime (width >> vocabulary) => exact == sketch
    out["heavy_hitters_cm"] = out["top_words"]
    out["ann_topk"] = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cosine
  FROM q CROSS JOIN embeddings c
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id
FROM ranked WHERE rank <= 10"""
    out["ivf_topk"] = out["ann_topk"]
    from condor_ray.pipelines.textstats import (
        bpe_token_sql,
        corpus_filters_sql,
        lang_id_sql,
        quality_sql,
    )

    from condor_ray.pipelines.textstats import word_rarity_sql

    # fused doc_profile row: token_stats + bpe_token_stats + quality_scores
    # + language_id + word_rarity joined on doc_id (each component twin is
    # bit-identical standalone; rarity contributes only its integer sums —
    # its n_words duplicates quality's)
    out["doc_profile"] = f"""
SELECT t.doc_id, t.n_tokens, t.n_chars, b.n_bpe_tokens,
       q.n_words, q.mean_word_len, q.punct_ratio, q.stopword_ratio,
       q.quality, l.lang_pred, r.rarity_sum, r.min_count
FROM ({_token_sql}) t
JOIN ({bpe_token_sql("documents")}) b USING (doc_id)
JOIN ({quality_sql("documents")}) q USING (doc_id)
JOIN ({lang_id_sql("documents")}) l USING (doc_id)
JOIN ({word_rarity_sql("documents")}) r USING (doc_id)"""
    out["corpus_filters"] = corpus_filters_sql("documents")
    from condor_ray.pipelines.dedup import decontaminate_sql

    out["decontam_docs"] = decontaminate_sql("documents", "doc_id % 101 = 7")
    from condor_ray.pipelines.clean import clean_corpus_sql

    out["clean_corpus"] = clean_corpus_sql(
        _CLEAN_CORPUS_TABLE, "doc_id % 101 = 7"
    )
    # winnowing fingerprints: HUGEINT Horner over char codepoints == the Ray
    # side's Rabin-Karp over utf-8 bytes (the documents corpus is pure ASCII
    # — verified <= U+0079 at every sf — and every doc is >= 8 chars, so the
    # short-doc blake2b branch never fires)
    out["doc_fingerprints"] = r"""
WITH cp AS (
  SELECT doc_id,
         list_transform(range(1, length(text)+1),
                        i -> CAST(unicode(text[i]) AS HUGEINT)) AS c,
         length(text) AS L
  FROM documents
), h AS (
  SELECT doc_id,
         list_transform(range(1, L - 6),
           i -> CAST((((((((c[i]*257 + c[i+1])*257 + c[i+2])*257 + c[i+3])*257
                + c[i+4])*257 + c[i+5])*257 + c[i+6])*257 + c[i+7])
                % 2147483647 AS BIGINT)) AS hs
  FROM cp WHERE L >= 8
), mins AS (
  SELECT doc_id,
         CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
              ELSE list_transform(range(1, len(hs) - 2),
                     j -> least(hs[j], hs[j+1], hs[j+2], hs[j+3])) END AS m
  FROM h
)
SELECT doc_id,
       CAST(len(list_distinct(m)) AS BIGINT) AS n_fingerprints,
       list_min(m) AS fingerprint_min
FROM mins"""
    # the synthetic image payloads are deterministic functions of
    # (doc_id, text), so the whole binary pipeline — synthesize, decode
    # (the marked fake-codec branch), frame-sample — is SQL-checkable;
    # mean_intensity is an exact int-sum / int-len double on both sides
    _IMG_BODY_CTE = """
WITH geom AS (
  SELECT doc_id, text,
         CAST(16 + (doc_id % 16) * 8 AS BIGINT) AS w,
         CAST(16 + (length(text) % 16) * 8 AS BIGINT) AS h
  FROM documents
), body AS (
  SELECT doc_id, w, h,
         substring(repeat(text, CAST(w*h*3 // length(text) AS INT) + 1), 1,
                   CAST(least(w*h*3, 4096) AS INT)) AS b
  FROM geom
)"""
    out["image_features"] = f"""{_IMG_BODY_CTE}
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(range(1, length(b)+1), i -> unicode(b[i]))) AS DOUBLE)
         / length(b) AS mean_intensity,
       CAST(w AS DOUBLE) / h AS aspect
FROM body"""
    out["frame_samples"] = f"""{_IMG_BODY_CTE}
SELECT doc_id, CAST(f AS INT) AS frame,
       CAST(COALESCE(list_sum(list_transform(range(1, length(chunk)+1),
                                             i -> unicode(chunk[i]))), 0)
            AS BIGINT) AS checksum
FROM (
  SELECT doc_id, f, substring(b, CAST(f*256+1 AS INT), 256) AS chunk
  FROM body, UNNEST(range(0, greatest(length(b)//256, 1), 4)) AS t(f)
)"""
    # audio twin: regenerate the exact int16 PCM words v_i and aggregate in
    # the INTEGER domain (no float summation order to match); constants
    # mirror synthesize_audio_table (rate 16000, mono)
    out["audio_features"] = """
WITH frames AS (
  SELECT doc_id, 1000 + (doc_id % 7) * 250 AS n
  FROM documents
), samples AS (
  SELECT doc_id, n, (doc_id*31 + i*17) % 65535 - 32767 AS v
  FROM frames, UNNEST(range(0, n)) AS t(i)
)
SELECT doc_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(n AS BIGINT) AS n_frames,
       CAST(sum(v*v) AS BIGINT) AS sum_sq,
       CAST(max(abs(v)) AS BIGINT) AS peak_abs
FROM samples GROUP BY doc_id, n"""
    # string-trigram set Jaccard == the Ray side's hashed-shingle set Jaccard
    # (distinct 64-bit shingle hashes <-> distinct trigrams; both sides do one
    # exact int/int double division)
    out["jaccard_verify"] = r"""
WITH step AS (SELECT max(doc_id) + 1 AS s FROM documents),
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT s FROM step), text || ' planted tail'
  FROM documents WHERE doc_id % 10 = 0
),
pairs AS (
  SELECT doc_id AS doc_a, doc_id + (SELECT s FROM step) AS doc_b
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT d.doc_id AS doc_a, d.doc_id + 1 AS doc_b FROM documents d
  WHERE d.doc_id % 7 = 0
    AND EXISTS (SELECT 1 FROM documents e WHERE e.doc_id = d.doc_id + 1)
),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              END) AS g
  FROM (SELECT doc_id, regexp_extract_all(text, '[^\t\n\f\r ]+') AS w FROM aug)
)
SELECT p.doc_a, p.doc_b,
       CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
         / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) AS jaccard
FROM pairs p
JOIN grams ga ON ga.doc_id = p.doc_a
JOIN grams gb ON gb.doc_id = p.doc_b"""
    return out

