"""Stream-stream join: turn stream x tool-call stream per conversation.

North-rule requirement (not in the reference, SURVEY §2.7 last row): correlate
each tool turn with its tool-call record on conv_id within a time bound.

Join semantics: ``turns t JOIN tool_calls c ON t.conv_id = c.conv_id AND
c.ts BETWEEN t.ts AND t.ts + bound`` (tool calls fire 0..bound after their
turn).  Orphan calls (conv absent) match nothing; duplicate calls produce
duplicate output rows — both asserted by tests on the F2 fixture.

Physical plan (batch): bucket BOTH sides by hash(conv_id) % B, tag the side,
union, ``groupby(bucket).map_groups`` joining the two sides per bucket with a
pandas merge + vectorized time filter — the explicit partitioned hash join
from the Ray guide; B and hot-key handling are the same conv partitioning the
rest of the engine uses.

Physical plan (streaming): per-partition join buffers live in
``JoinStateStore`` actors fed by the same conv-hash split; matches emit at
watermark advance and buffers purge below ``watermark - bound`` (late rows
cannot match anymore), keeping state bounded by the time bound, not the
stream length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import java_string_hash_arrow


def _bucket_of(conv_col, n_buckets: int) -> np.ndarray:
    from ..engine.streaming import _murmur_mix_array

    return _murmur_mix_array(java_string_hash_arrow(conv_col)) % n_buckets


def join_turns_tool_calls(
    turns_ds,
    tool_calls_ds,
    bound_ms: int = 5_000,
    n_buckets: int = 32,
):
    """Batch partitioned hash join.  Output: conv_id, turn_idx, turn_ts,
    call_id, tool, status, call_ts (int64 us)."""
    import pyarrow as pa

    bound_us = bound_ms * 1000

    def tag_turns(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch["tool"]))  # NULL never joins
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(batch["conv_id"], n_buckets)),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "turn_ts": batch["ts"].cast(pa.int64()),
                "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
                "call_id": pa.nulls(batch.num_rows, pa.string()),
                "tool": batch["tool"],
                "status": pa.nulls(batch.num_rows, pa.string()),
                "call_ts": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def tag_calls(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(batch["conv_id"], n_buckets)),
                "conv_id": batch["conv_id"],
                "turn_idx": pa.nulls(batch.num_rows, pa.int32()),
                "turn_ts": pa.nulls(batch.num_rows, pa.int64()),
                "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
                "call_id": batch["call_id"],
                "tool": batch["tool"],
                "status": batch["status"],
                "call_ts": batch["ts"].cast(pa.int64()),
            }
        )

    tagged = turns_ds.map_batches(tag_turns, batch_format="pyarrow").union(
        tool_calls_ds.map_batches(tag_calls, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        turns = g[g["side"] == 0]
        calls = g[g["side"] == 1]
        if turns.empty or calls.empty:
            return _empty_join_frame()
        merged = turns[["conv_id", "turn_idx", "turn_ts", "tool"]].merge(
            calls[["conv_id", "call_id", "tool", "status", "call_ts"]],
            on=["conv_id", "tool"],
            how="inner",
        )
        ok = (merged["call_ts"] >= merged["turn_ts"]) & (
            merged["call_ts"] <= merged["turn_ts"] + bound_us
        )
        out = merged[ok].copy()
        return out[
            ["conv_id", "turn_idx", "turn_ts", "call_id", "tool", "status", "call_ts"]
        ].astype({"turn_idx": np.int32, "turn_ts": np.int64, "call_ts": np.int64})

    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def _empty_join_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype=np.int32),
            "turn_ts": pd.Series(dtype=np.int64),
            "call_id": pd.Series(dtype=object),
            "tool": pd.Series(dtype=object),
            "status": pd.Series(dtype=object),
            "call_ts": pd.Series(dtype=np.int64),
        }
    )
