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

Physical plan: an explicit TASK-BASED hash exchange (the same
``num_returns`` fan-out the wavelet partition path uses) — each input block
shards by ``hash(key) % B`` straight through the object store, and one task
per bucket concatenates its left + right shards and joins them with pandas
``merge_asof`` (a C merge kernel over ts-sorted int64 arrays — no per-key
Python).  Rows cross the wire exactly once, projected to the join columns
only, and never enter Ray Data's sort-based groupby (whose range-sample +
per-block-sort machinery measured 25 s for a 4 M-row join that the task
exchange does in ~2 s).  B is the engine's standard conv partitioning.  At
100 TB the right side streams through the same exchange as the left —
nothing is broadcast or materialized (``broadcast=True`` opts into the
small-right-side plan instead).
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
    direction: str = "backward",
):
    """Left as-of join: one output row per left row; right columns are null
    when no right row of the key precedes it (within tolerance).

    ``direction``: "backward" (default — LATEST right row with ts <=
    left ts; ties resolve to the GREATEST (ts, *right_order)) or
    "forward" (EARLIEST right row with ts >= left ts; ties resolve to
    the LEAST (ts, *right_order)).

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

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    n_buckets = n_buckets or default_n_parts()
    right_ts = right_ts or ts
    left_cols = dict(left_cols or {})
    right_cols = dict(right_cols or {})
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right output names collide: {sorted(overlap)}")
    reserved = {key, "ts_us"} & (set(left_cols) | set(right_cols))
    if reserved:
        # a projection named like the key (or the surfaced ts) would
        # overwrite the routing/join column inside the shard tasks —
        # silently scattering same-key rows across buckets
        raise ValueError(
            f"output names collide with the join columns: {sorted(reserved)}"
        )

    def _arrow_type(schema, src):
        t = dict(zip(schema.names, schema.types))[src]
        if not isinstance(t, pa.DataType):
            # pandas-backed datasets surface numpy dtypes; object means
            # strings in every projection this operator supports
            t = pa.string() if t == np.dtype(object) else pa.from_numpy_dtype(t)
        if pa.types.is_dictionary(t):
            # the combine's pandas round-trip re-encodes dictionaries with
            # whatever index width fits the bucket — canonicalize to the
            # value type so the block cast never sees an index mismatch
            t = t.value_type
        return pa.int64() if pa.types.is_timestamp(t) else t

    # the union needs one schema: null columns for the absent side carry the
    # OWNING side's real type (timestamps surface as int64 µs)
    lschema, rschema = left_ds.schema(), right_ds.schema()
    for side, schema in (("left", lschema), ("right", rschema)):
        kt = dict(zip(schema.names, schema.types)).get(key)
        # pandas-backed datasets surface Python types (e.g. ``object``)
        # instead of Arrow types — only Arrow-typed keys are checkable here
        if isinstance(kt, pa.DataType) and not (
            pa.types.is_string(kt)
            or pa.types.is_large_string(kt)
            or (
                pa.types.is_dictionary(kt)
                and (
                    pa.types.is_string(kt.value_type)
                    or pa.types.is_large_string(kt.value_type)
                )
            )
        ):
            # the shard path hashes the key with the Java string hash and
            # pins the empty-shard face to pa.string(); a non-string key
            # would drift schemas between empty and non-empty shards
            raise TypeError(
                f"asof_join key {key!r} must be a string column; the "
                f"{side} side has {kt} (cast it before joining)"
            )
    left_types = {n: _arrow_type(lschema, s) for n, s in left_cols.items()}
    right_types = {n: _arrow_type(rschema, s) for n, s in right_cols.items()}

    all_types = {**left_types, **right_types}
    out_cols = [key, "ts_us", *left_cols, *right_cols]
    # ONE canonical output schema enforced on every emitted block (both
    # plans): right-side numerics are float64 (unmatched rows are null in
    # some blocks), strings stay strings — without the cast, empty buckets
    # and all-matched batches drift null/int64 against their siblings and
    # the result Dataset can't be concatenated or written
    out_schema = pa.schema(
        [
            (key, pa.string()),
            ("ts_us", pa.int64()),
            *[(n, left_types[n]) for n in left_cols],
            *[
                (
                    n,
                    pa.float64()
                    if pa.types.is_integer(right_types[n])
                    or pa.types.is_floating(right_types[n])
                    else right_types[n],
                )
                for n in right_cols
            ],
        ]
    )

    if broadcast:
        return _asof_broadcast(
            left_ds, right_ds, key, ts, right_ts, left_cols, right_cols,
            right_order, tolerance_us, out_cols, out_schema, direction,
        )

    from ..engine.exchange import two_sided_hash_exchange

    def _shard(ts_col, cols):
        types = {n: all_types[n] for n in cols}

        def fn(block, n_parts):
            return _shard_asof_side(block, n_parts, key, ts_col, cols, types)

        return fn

    def _combine(n_left, *tables):
        return _asof_bucket_join(
            n_left, key, list(left_cols), list(right_cols),
            list(right_order), tolerance_us, direction, out_schema, *tables,
        )

    return two_sided_hash_exchange(
        left_ds, right_ds, n_buckets,
        _shard(ts, left_cols), _shard(right_ts, right_cols), _combine,
    )


def _shard_asof_side(tbl, n_parts: int, key: str, ts_col: str, cols: dict, types: dict):
    """One input block -> n_parts shards routed by hash(key) % n_parts,
    carrying only (key, ts_us, *projected cols)."""
    import pyarrow as pa

    if isinstance(tbl, pd.DataFrame):  # Ray Data blocks may be pandas
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    empty = pa.table(
        {
            key: pa.array([], type=pa.string()),
            "ts_us": pa.array([], type=pa.int64()),
            **{n: pa.array([], type=t) for n, t in types.items()},
        }
    )
    if tbl.num_rows == 0 or key not in tbl.schema.names:
        # zero-row blocks can arrive SCHEMALESS from long plans
        return tuple(empty for _ in range(n_parts))
    # normalize the key to plain string: dictionary<string> and large_string
    # inputs must not drift schemas against the pa.string() empty face
    kcol = tbl[key]
    if kcol.type != pa.string():
        kcol = kcol.cast(pa.string())
    proj = {key: kcol, "ts_us": tbl[ts_col].cast(pa.int64())}
    for name, src in cols.items():
        col = tbl[src]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        elif pa.types.is_dictionary(col.type):
            # match the canonical (decayed) empty face — a dictionary shard
            # concatenated against a plain-typed empty shard won't fold
            col = col.cast(col.type.value_type)
        proj[name] = col
    from ..engine.exchange import split_by_partition

    flat = pa.table(proj).combine_chunks()
    part = _bucket_of(flat[key], n_parts).astype(np.int64)
    return split_by_partition(flat, part, n_parts)


def _asof_bucket_join(
    n_left: int,
    key: str,
    left_names: list,
    right_names: list,
    right_order: list,
    tolerance_us,
    direction: str,
    out_schema,
    *tables,
):
    """Per-bucket conquer: concat the bucket's left + right shards, ONE
    merge_asof.  Every emitted block is cast to ``out_schema`` (right-side
    numerics are float64 there — unmatched left rows are NaN in some
    buckets, and a stable schema across blocks beats per-bucket int/float
    or string/null drift)."""
    import pyarrow as pa

    out_cols = [key, "ts_us", *left_names, *right_names]
    lefts = [t for t in tables[:n_left] if t.num_rows]
    rights = [t for t in tables[n_left:] if t.num_rows]

    def _stabilize(df: pd.DataFrame) -> pa.Table:
        for c in right_names:
            if pd.api.types.is_numeric_dtype(df[c]):
                df[c] = df[c].astype(np.float64)
        # the cast pins the canonical schema even when pandas inference
        # degraded a column (all-None string -> null type, etc.)
        return pa.Table.from_pandas(
            df[out_cols], preserve_index=False
        ).cast(out_schema)

    def _with_null_right(left_df: pd.DataFrame) -> pa.Table:
        out = left_df.copy()
        for c in right_names:
            t = out_schema.field(c).type
            numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
            out[c] = np.nan if numeric else None
        return _stabilize(out)

    if not lefts:
        # zero left rows in this bucket: the empty face comes straight from
        # the schema (shard tables may be absent when a side has no blocks)
        return out_schema.empty_table()
    left = pa.concat_tables(lefts).to_pandas()
    if not rights:
        return _with_null_right(left)
    right = pa.concat_tables(rights).to_pandas()
    left = left.sort_values(
        "ts_us", kind="mergesort"
    )  # merge_asof needs ts order; mergesort keeps determinism
    right = right.sort_values(
        ["ts_us", *right_order], kind="mergesort"
    )  # ts ties: backward picks the LAST (greatest right_order), forward
    # picks the FIRST (least right_order) -- both deterministic
    merged = pd.merge_asof(
        left,
        right.rename(columns={"ts_us": "_r_ts"}),
        left_on="ts_us",
        right_on="_r_ts",
        by=key,
        direction=direction,
        tolerance=tolerance_us,
    )
    return _stabilize(merged.reset_index(drop=True))


def _asof_broadcast(
    left_ds, right_ds, key, ts, right_ts, left_cols, right_cols,
    right_order, tolerance_us, out_cols, out_schema, direction="backward",
):
    """Broadcast binding of ``asof_join``: small right side materializes to
    one ts-sorted frame in plasma (``ray.put``), an actor pool reads it ONCE
    per actor (``__init__``), and every left batch merges locally — the big
    side never shuffles.  Every output batch is cast to the same canonical
    ``out_schema`` the partitioned path emits (all-matched batches would
    otherwise keep right ints as int64 while miss-bearing batches go
    float64 — block-to-block drift inside one Dataset)."""
    import pyarrow as pa
    import ray

    def _proj(batch: pa.Table, ts_col: str, cols: dict) -> pd.DataFrame:
        kcol = batch[key]
        if kcol.type != pa.string():  # dictionary<string>/large_string keys
            kcol = kcol.cast(pa.string())
        out = {key: kcol.to_pandas(), "ts_us": batch[ts_col].cast(pa.int64()).to_pandas()}
        for name, src in cols.items():
            col = batch[src]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            out[name] = col.to_pandas()
        return pd.DataFrame(out)

    right_refs = right_ds.to_arrow_refs()
    if right_refs:
        # ONE batched get: per-ref round-trips serialize object fetches
        right_df = _proj(
            pa.concat_tables(ray.get(right_refs)), right_ts, right_cols
        )
    else:  # zero-block right side: the all-null left join, like the
        # partitioned path (concat_tables([]) raises)
        right_df = pd.DataFrame(
            {
                key: pd.Series(dtype=object),
                "ts_us": pd.Series(dtype=np.int64),
                **{n: pd.Series(dtype=object) for n in right_cols},
            }
        )
    right_df = right_df.sort_values(
        ["ts_us", *right_order], kind="mergesort"
    ).rename(columns={"ts_us": "_r_ts"}).reset_index(drop=True)
    ref = ray.put(right_df)

    class BroadcastAsof:
        def __init__(self):
            self.right = ray.get(ref)  # once per actor, not per batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or key not in batch.schema.names:
                return out_schema.empty_table()
            left = _proj(batch, ts, left_cols).sort_values(
                "ts_us", kind="mergesort"
            )
            merged = pd.merge_asof(
                left,
                self.right,
                left_on="ts_us",
                right_on="_r_ts",
                by=key,
                direction=direction,
                tolerance=tolerance_us,
            )
            return pa.Table.from_pandas(
                merged[out_cols].reset_index(drop=True), preserve_index=False
            ).cast(out_schema)

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
