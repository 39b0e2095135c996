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
each conv's rows — implemented as ``groupby(user_id).map_groups`` (one shuffle
on the SAME key the streaming engine partitions by, so at 100 TB this shuffle
is shared with the state-routing partitioning, not an extra exchange).
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


def _events_group_to_transcripts(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    uid = int(g["user_id"].iloc[0])
    role = g["event_type"].map(lambda e: _ROLE_MAP.get(e, "tool"))
    is_tool = role == "tool"
    return pd.DataFrame(
        {
            "conv_id": f"c{uid}",
            "turn_idx": np.arange(len(g), dtype=np.int32),
            "role": role.to_numpy(),
            "text": (g["props"] + ":" + g["event_type"]).to_numpy(),
            "tool": np.where(
                is_tool, "tool_" + (g["event_id"] % 20).astype(str), None
            ),
            "ts": g["ts"].to_numpy(),
        }
    )


def transcripts_from_events(sf_dir: str):
    """Ray Dataset of transcripts derived from ``{sf_dir}/events.parquet``."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return ds.groupby("user_id").map_groups(
        _events_group_to_transcripts, batch_format="pandas"
    )
