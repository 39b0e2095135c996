"""Adapter: driver ``events`` table -> transcripts shape, with a matching
DuckDB SQL derivation so every downstream pipeline is oracle-checkable.

The derivation is intentionally trivial and deterministic so the Ray side and
the SQL side agree bit-for-bit:

    conv_id  = 'c' || user_id
    turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
    role     = view/signup -> 'user', click/purchase -> 'assistant', else 'tool'
    text     = props || ':' || event_type
    tool     = 'tool_' || (event_id % 20)   when role = 'tool' else NULL
    ts       = ts

Scale note: the per-conversation ``turn_idx`` ordinal requires co-locating
each conv's rows — one hash shuffle on the SAME key the streaming engine
partitions by, so at 100 TB this shuffle is shared with the state-routing
partitioning, not an extra exchange.  It runs through the engine's
task-based ``hash_exchange`` (``engine/exchange.py``), not Ray Data's
sort-based groupby, so rows cross the wire once with no range-sampled sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
       CASE WHEN event_type IN ('view', 'signup') THEN 'user'
            WHEN event_type IN ('click', 'purchase') THEN 'assistant'
            ELSE 'tool' END AS role,
       props || ':' || event_type AS text,
       CASE WHEN event_type NOT IN ('view', 'signup', 'click', 'purchase')
            THEN 'tool_' || CAST(event_id % 20 AS VARCHAR) ELSE NULL END AS tool,
       ts
FROM events
""".strip()

_ROLE_MAP = {
    "view": "user",
    "signup": "user",
    "click": "assistant",
    "purchase": "assistant",
}


def _events_part_to_transcripts(g: pd.DataFrame) -> pd.DataFrame:
    """One hash partition of users -> transcript rows, fully vectorized
    (per-user turn ordinals via boundary cumsum, never one Ray group per
    user — per-group dispatch costs ~0.5 ms, fatal at millions of users)."""
    uid = g["user_id"].to_numpy()
    order = np.lexsort((g["event_id"].to_numpy(), g["ts"].to_numpy(), uid))
    g = g.iloc[order]
    uid = uid[order]
    n = len(g)
    if n == 0:
        turn_idx = np.empty(0, dtype=np.int32)
    else:
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.concatenate((starts, [n])))
        turn_idx = (
            np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        ).astype(np.int32)
    role = g["event_type"].map(_ROLE_MAP).fillna("tool")
    is_tool = (role == "tool").to_numpy()
    return pd.DataFrame(
        {
            "conv_id": np.char.add("c", uid.astype(str)),
            "turn_idx": turn_idx,
            "role": role.to_numpy(),
            "text": (g["props"] + ":" + g["event_type"]).to_numpy(),
            "tool": np.where(
                is_tool, "tool_" + (g["event_id"] % 20).astype(str), None
            ),
            "ts": g["ts"].to_numpy(),
        }
    )


def transcripts_from_events(sf_dir: str, n_parts: int | None = None):
    """Ray Dataset of transcripts derived from ``{sf_dir}/events.parquet``."""
    from ..runtime import default_n_parts

    n_parts = n_parts or default_n_parts()
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    from ..engine.exchange import hash_exchange

    def shard(block, n_buckets: int):
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "props": pa.array([], pa.string()),
            }
        )
        if block.num_rows == 0 or "user_id" not in block.schema.names:
            return tuple(empty for _ in range(n_buckets))  # schemaless guard
        from ..engine.exchange import split_by_partition

        from ..hashing import int_bucket_of

        part = int_bucket_of(block["user_id"].to_numpy(), n_buckets)
        return split_by_partition(block.combine_chunks(), part, n_buckets)

    # pinned output schema: an all-None tool bucket must still be string,
    # and ts must stay timestamp[us] across every block
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def combine(*tables):
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return out_schema.empty_table()
        out = _events_part_to_transcripts(pa.concat_tables(tables).to_pandas())
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return hash_exchange(ds, n_parts, shard, combine)
