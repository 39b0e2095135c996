"""Generic temporal joins: as-of join and point-in-interval join.

Beyond the reference surface (SURVEY §2.10): the two lookup shapes every
transcript pipeline needs that neither Ray Data nor the reference exposes as
an operator —

- ``asof_join``: for each left row (key, ts) attach the LATEST right row of
  the same key with ``right.ts <= left.ts`` (optionally within a tolerance).
  Deterministic among right-side ts ties: the row greatest under
  ``(ts, *right_order)`` wins, so results are partition-count invariant.
- ``interval_join``: assign each point (key, ts) to the interval
  ``[start, end]`` of the same key that contains it, for NON-OVERLAPPING
  intervals per key (e.g. session windows).  Composed as an as-of join on
  interval start plus a containment filter — one shuffle, no range
  explosion.

Physical plan (same partitioned-exchange discipline as ``join.py``): both
sides tag into a unified schema with a ``hash(key) % B`` bucket + a side
marker, union, and ONE ``groupby(bucket).map_groups`` joins each bucket with
pandas ``merge_asof`` (a C merge kernel over ts-sorted int64 arrays — no
per-key Python).  B is the engine's standard conv partitioning; the shuffle
carries only the projected join columns.  At 100 TB the right side streams
through the same exchange as the left — nothing is broadcast or
materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import java_string_hash_arrow
from ..runtime import default_n_parts


def _bucket_of(key_col, n_buckets: int) -> np.ndarray:
    from ..engine.streaming import _murmur_mix_array

    return _murmur_mix_array(java_string_hash_arrow(key_col)) % n_buckets


def asof_join(
    left_ds,
    right_ds,
    key: str = "conv_id",
    ts: str = "ts",
    right_ts: str | None = None,
    left_cols: dict[str, str] | None = None,
    right_cols: dict[str, str] | None = None,
    right_order: tuple[str, ...] = (),
    tolerance_us: int | None = None,
    n_buckets: int | None = None,
    broadcast: bool = False,
):
    """Left as-of join: one output row per left row; right columns are null
    when no right row of the key precedes it (within tolerance).

    ``left_cols`` / ``right_cols``: ``{output_name: source_column}``
    projections (output names must be disjoint; ``ts`` columns surface as
    int64 epoch-µs).  ``right_ts``: the right side's event-time column when
    it differs from ``ts``.  ``right_order``: extra right columns (already
    among ``right_cols``'s outputs) breaking right-side ts ties — greatest
    wins.  Output: ``key``, ``ts_us``, left outputs, right outputs.

    ``broadcast=True``: the right side must be SMALL (a dimension /
    lookup stream).  It materializes once, ships via ``ray.put`` (read by
    every task, never re-serialized per batch), and the join runs as a
    per-batch merge over the un-shuffled left — the big side never enters
    an exchange.  Identical output to the partitioned path."""
    import pyarrow as pa

    n_buckets = n_buckets or default_n_parts()
    right_ts = right_ts or ts
    left_cols = dict(left_cols or {})
    right_cols = dict(right_cols or {})
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right output names collide: {sorted(overlap)}")

    def _arrow_type(schema, src):
        t = dict(zip(schema.names, schema.types))[src]
        return pa.int64() if pa.types.is_timestamp(t) else t

    # the union needs one schema: null columns for the absent side carry the
    # OWNING side's real type (timestamps surface as int64 µs)
    lschema, rschema = left_ds.schema(), right_ds.schema()
    left_types = {n: _arrow_type(lschema, s) for n, s in left_cols.items()}
    right_types = {n: _arrow_type(rschema, s) for n, s in right_cols.items()}

    all_types = {**left_types, **right_types}
    out_cols = [key, "ts_us", *left_cols, *right_cols]

    if broadcast:
        return _asof_broadcast(
            left_ds, right_ds, key, ts, right_ts, left_cols, right_cols,
            right_order, tolerance_us, out_cols, all_types,
        )

    def _tag(ts_col: str, cols_here: dict, side: int):
        def tag(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or key not in batch.schema.names:
                # zero-row blocks can arrive SCHEMALESS from long plans
                return pa.table(
                    {
                        "bucket": pa.array([], type=pa.int64()),
                        key: pa.array([], type=pa.string()),
                        "ts_us": pa.array([], type=pa.int64()),
                        "side": pa.array([], type=pa.int8()),
                        **{n: pa.array([], type=t) for n, t in all_types.items()},
                    }
                )
            out = {
                "bucket": pa.array(
                    _bucket_of(batch[key], n_buckets).astype(np.int64)
                ),
                key: batch[key],
                "ts_us": batch[ts_col].cast(pa.int64()),
                "side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            }
            # canonical column order on BOTH sides — union concatenates
            for name in all_types:
                if name in cols_here:
                    col = batch[cols_here[name]]
                    if pa.types.is_timestamp(col.type):
                        col = col.cast(pa.int64())
                    out[name] = col
                else:
                    out[name] = pa.nulls(batch.num_rows, all_types[name])
            return pa.table(out)

        return tag

    tagged = left_ds.map_batches(_tag(ts, left_cols, 0), batch_format="pyarrow").union(
        right_ds.map_batches(_tag(right_ts, right_cols, 1), batch_format="pyarrow")
    )


    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if left.empty:
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype) for c in out_cols})
        if right.empty:
            out = left[[key, "ts_us", *left_cols]].copy()
            for c in right_cols:
                out[c] = np.nan
            return out.reset_index(drop=True)
        left = left.sort_values(
            "ts_us", kind="mergesort"
        )  # merge_asof needs ts order; mergesort keeps determinism
        right = right.sort_values(
            ["ts_us", *right_order], kind="mergesort"
        )  # among ts ties merge_asof picks the LAST -> greatest right_order
        merged = pd.merge_asof(
            left[[key, "ts_us", *left_cols]],
            right[[key, "ts_us", *right_cols]].rename(columns={"ts_us": "_r_ts"}),
            left_on="ts_us",
            right_on="_r_ts",
            by=key,
            direction="backward",
            tolerance=tolerance_us,
        )
        return merged[out_cols].reset_index(drop=True)

    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def _asof_broadcast(
    left_ds, right_ds, key, ts, right_ts, left_cols, right_cols,
    right_order, tolerance_us, out_cols, all_types,
):
    """Broadcast binding of ``asof_join``: small right side materializes to
    one ts-sorted frame in plasma (``ray.put``), an actor pool reads it ONCE
    per actor (``__init__``), and every left batch merges locally — the big
    side never shuffles."""
    import pyarrow as pa
    import ray

    def _proj(batch: pa.Table, ts_col: str, cols: dict) -> pd.DataFrame:
        out = {key: batch[key].to_pandas(), "ts_us": batch[ts_col].cast(pa.int64()).to_pandas()}
        for name, src in cols.items():
            col = batch[src]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            out[name] = col.to_pandas()
        return pd.DataFrame(out)

    right_tbl = pa.concat_tables(
        [ray.get(r) for r in right_ds.to_arrow_refs()]
    )
    right_df = _proj(right_tbl, right_ts, right_cols).sort_values(
        ["ts_us", *right_order], kind="mergesort"
    ).rename(columns={"ts_us": "_r_ts"}).reset_index(drop=True)
    ref = ray.put(right_df)

    class BroadcastAsof:
        def __init__(self):
            self.right = ray.get(ref)  # once per actor, not per batch

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            if batch.num_rows == 0 or key not in batch.schema.names:
                return pa.table(
                    {
                        key: pa.array([], pa.string()),
                        "ts_us": pa.array([], pa.int64()),
                        **{n: pa.array([], t) for n, t in all_types.items()},
                    }
                ).to_pandas()[out_cols]
            left = _proj(batch, ts, left_cols).sort_values(
                "ts_us", kind="mergesort"
            )
            merged = pd.merge_asof(
                left,
                self.right,
                left_on="ts_us",
                right_on="_r_ts",
                by=key,
                direction="backward",
                tolerance=tolerance_us,
            )
            return merged[out_cols].reset_index(drop=True)

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return left_ds.map_batches(
        BroadcastAsof,
        batch_format="pyarrow",
        concurrency=(1, max(2, ncpu // 2)),  # never the whole CPU budget:
        # an actor pool sized to every core starves the upstream read
    )


def interval_join(
    points_ds,
    intervals_ds,
    key: str = "conv_id",
    ts: str = "ts",
    start: str = "session_start",
    end: str = "session_end",
    point_cols: dict[str, str] | None = None,
    interval_cols: dict[str, str] | None = None,
    n_buckets: int | None = None,
):
    """Inner point-in-interval join for NON-OVERLAPPING per-key intervals:
    each point matches the unique interval with ``start <= ts <= end``
    (points outside every interval drop).  Output: ``key``, ``ts_us``,
    point outputs, ``start``/``end`` (int64 µs), interval outputs."""
    interval_cols = dict(interval_cols or {})
    joined = asof_join(
        points_ds,
        intervals_ds,
        key=key,
        ts=ts,
        right_ts=start,
        left_cols=point_cols,
        right_cols={start: start, end: end, **interval_cols},
        n_buckets=n_buckets,
    )
    # non-overlap => the latest start <= ts is the only containment candidate
    import pyarrow as pa
    import pyarrow.compute as pc

    def contained(batch: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.is_valid(batch[end]),
            pc.greater_equal(batch[end], batch["ts_us"]),
        )
        out = batch.filter(pc.fill_null(keep, False))
        # matched rows only -> interval columns can drop their null face
        return out.set_column(
            out.schema.get_field_index(start), start, out[start].cast(pa.int64())
        ).set_column(
            out.schema.get_field_index(end), end, out[end].cast(pa.int64())
        )

    # re-bind interval_ds's ts column name: asof_join consumed `start` as its
    # right-side ts, so expose it back under the caller's name
    return joined.map_batches(contained, batch_format="pyarrow")
