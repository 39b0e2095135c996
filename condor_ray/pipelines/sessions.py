"""Session windows and count windows.

- Session windows (Scotty session support, SURVEY §2.6): per-conversation gap
  merge — a new session starts when the gap to the previous turn is >= gap.
  Implemented as ``groupby(conv_id).map_groups`` over ts-sorted groups (the
  same conv_id co-location shuffle the engine's partitioning uses); the SQL
  oracle is the classic gaps-and-islands form.
- Count windows: the reference's ``countWindow(size/parallelism)`` makes
  boundaries parallelism-dependent (SynopsisBuilder.java:220); we define them
  on GLOBAL arrival ordinals instead (documented deviation, SURVEY §7) so the
  result is partition-count invariant.  For the events-derived stream the
  arrival ordinal IS event_id (the file is arrival-ordered), which keeps the
  oracle in plain SQL.  ``count_window_ids(mode="condor")`` reproduces the
  reference's parallelism-dependent boundaries exactly for callers that need
  bit-parity with a Condor deployment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..windows import sessionize


def session_stats(ds, gap_ms: int):
    """Per-conversation sessions: conv_id, session_idx, session_start,
    session_end (int64 us), n_turns."""
    gap_us = gap_ms * 1000

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        sess = sessionize(ts, gap_us)
        out = (
            pd.DataFrame({"session_idx": sess, "ts": ts})
            .groupby("session_idx")
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_turns=("ts", "size"),
            )
            .reset_index()
        )
        out.insert(0, "conv_id", g["conv_id"].iloc[0])
        out["session_idx"] = out["session_idx"].astype(np.int64)
        out["n_turns"] = out["n_turns"].astype(np.int64)
        return out

    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def session_sql(transcripts_cte: str, gap_ms: int) -> str:
    gap_us = gap_ms * 1000
    return f"""{transcripts_cte},
marked AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
islands AS (
  SELECT conv_id, ts_us,
         CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM marked
)
SELECT conv_id, session_idx,
       min(ts_us) AS session_start,
       max(ts_us) AS session_end,
       count(*) AS n_turns
FROM islands GROUP BY conv_id, session_idx"""


def count_window_ids(
    ordinals: np.ndarray,
    size: int,
    parallelism: int = 1,
    mode: str = "global",
    subtask: np.ndarray | None = None,
) -> np.ndarray:
    """Count-window id per element.

    mode="global" (the documented default): wid = arrival ordinal // size —
    partition-count invariant.

    mode="condor": reference parity with
    ``conn/.../processor/SynopsisBuilder.java:213-233`` — elements
    round-robin from each source subtask onto ``parallelism`` builders
    (rescale + AddParallelismIndex), each builder closes a partial synopsis
    every ``size // parallelism`` elements, and ``countWindowAll(P)`` merges
    every P consecutive partials into one window.  Emulated
    deterministically: builder = per-subtask round-robin counter % P;
    wid = per-builder arrival rank // (size // P).  With a single source
    subtask this degenerates to the global mode (round-robin interleaves
    builders in lockstep); with several subtasks the boundaries become
    distribution-dependent, exactly like the reference.
    """
    n = len(ordinals)
    order = np.argsort(ordinals, kind="stable")
    if mode == "global":
        wid = np.empty(n, dtype=np.int64)
        wid[order] = np.arange(n, dtype=np.int64) // size
        return wid
    if mode != "condor":
        raise ValueError(f"unknown count-window mode {mode!r}")
    if size % parallelism:
        raise ValueError("condor mode needs parallelism | size (Java int division drops the remainder per builder)")
    per = size // parallelism
    st = (
        np.zeros(n, dtype=np.int64)
        if subtask is None
        else np.asarray(subtask)[order]
    )
    # per-subtask round-robin counter -> builder id
    df = pd.DataFrame({"st": st})
    rr = df.groupby("st", sort=False).cumcount().to_numpy()
    builder = rr % parallelism
    # per-builder arrival rank -> partial index -> window id
    rank = pd.DataFrame({"b": builder}).groupby("b", sort=False).cumcount().to_numpy()
    wid = np.empty(n, dtype=np.int64)
    wid[order] = rank // per
    return wid


def count_window_distinct(sf_dir: str, size: int):
    """Distinct conversations per count window of ``size`` arrival ordinals
    over the events stream (ordinal == event_id, see module docstring)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        wid = batch["event_id"].to_numpy() // size
        uid = batch["user_id"].to_numpy()
        m = int(uid.max()) + 1 if len(uid) else 1  # no fixed-radix overflow
        gkey = wid * m + uid
        uniq = np.unique(gkey)
        return pa.table(
            {
                "window_id": pa.array(uniq // m, type=pa.int64()),
                "user_id": pa.array(uniq % m, type=pa.int64()),
            }
        )

    p = ds.map_batches(pairs, batch_format="pyarrow")
    dedup = p.groupby(["window_id", "user_id"]).count()
    out = dedup.groupby("window_id").aggregate(Count(alias_name="n_convs"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_id": df["window_id"].astype(np.int64),
                "n_convs": df["n_convs"].astype(np.int64),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


def session_synopses(
    ds,
    gap_ms: int,
    synopsis: str = "CountMinSketch",
    params: tuple = (1024, 3, 7),
    key_field: str = "text",
    key_transform: str = "length",
):
    """One synopsis per (conversation, session window): the Scotty session
    path's keyed output (SURVEY §2.6) — sessions are per-key in the
    reference, so the natural key here is the conversation.

    Returns conv_id, session_start, session_end (int64 us), n_rows,
    synopsis_type, payload."""
    import pyarrow as pa

    from ..config import KeySpec
    from ..stages.extract import KeyExtractor
    from ..synopses.registry import make_synopsis

    gap_us = gap_ms * 1000
    extractor = KeyExtractor(KeySpec(key_field, key_transform))

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        sess = sessionize(ts, gap_us)
        values = extractor(pa.Table.from_pandas(g, preserve_index=False))
        rows = []
        for s in np.unique(sess):
            m = sess == s
            syn = make_synopsis(synopsis, params)
            syn.set_partition_value(g["conv_id"].iloc[0])
            syn.update_batch(values[m], timestamps=ts[m]) if syn.timestamped else syn.update_batch(values[m])
            rows.append(
                {
                    "conv_id": g["conv_id"].iloc[0],
                    "session_start": int(ts[m].min()),
                    "session_end": int(ts[m].max()),
                    "n_rows": int(m.sum()),
                    "synopsis_type": synopsis,
                    "payload": syn.to_bytes(),
                }
            )
        return pd.DataFrame(rows)

    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def session_synopsis_sql(transcripts_cte: str, gap_ms: int) -> str:
    """Oracle for ``session_synopses``: per-(conv, session) bounds + count.
    The Ray side emits ``n_rows`` from the session synopsis's own
    ``elements_processed``, so a hash match proves the per-session synopsis
    ingested exactly the session's turns."""
    gap_us = gap_ms * 1000
    return f"""{transcripts_cte},
marked AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
islands AS (
  SELECT conv_id, ts_us,
         CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM marked
)
SELECT conv_id,
       min(ts_us) AS session_start,
       max(ts_us) AS session_end,
       count(*) AS n_rows
FROM islands GROUP BY conv_id, session_idx"""
