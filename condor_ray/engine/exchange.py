"""Generic task-based two-sided hash exchange.

The engine's standard antidote to Ray Data's sort-based ``groupby`` for
co-partitioned joins (the wavelet partition path established the pattern;
``temporal_join`` and the batch stream-stream join reuse it): each input
block shards by ``hash(key) % B`` in ONE task with ``num_returns=B`` — the
fan-out rides the object store directly — and one task per bucket combines
its left + right shards.  Rows cross the wire exactly once, carry only the
caller's projection, and never touch a range-sampled sort exchange (which
measured 25 s for a 4 M-row join this plan does in ~2 s of task time).

At 100 TB both sides stream block-by-block through the shard tasks with
ordinary Ray backpressure; per-bucket state is bounded by that bucket's
rows, and B scales with the cluster (`default_n_parts`).
"""

from __future__ import annotations


def split_by_partition(tbl, part, n_parts: int):
    """One sorted-stable pass: Arrow table + per-row partition ids ->
    ``n_parts`` zero-copy-sliced tables (the shard tasks' inner step)."""
    import numpy as np
    import pyarrow as pa

    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
    sel = pa.array(order)
    return tuple(
        tbl.take(sel.slice(int(bounds[q]), int(bounds[q + 1] - bounds[q])))
        for q in range(n_parts)
    )


def hash_exchange(ds, n_buckets: int, shard, combine):
    """One-sided variant: ``shard(block, n_buckets)`` routes each input
    block into schema-stable per-bucket tables; ``combine(*tables)`` fuses
    one bucket.  Replaces ``groupby("part").map_groups`` for full-row
    streams (the sort-based groupby's range-sample + per-block sort costs
    multiples of the task fan-out at millions of rows)."""
    import ray
    import ray.data as rd

    shard_task = ray.remote(num_returns=n_buckets)(shard)
    parts: list[list] = [[] for _ in range(n_buckets)]
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            refs = shard_task.remote(bref, n_buckets)
            for q in range(n_buckets):
                parts[q].append(refs[q])
    combine_task = ray.remote(combine)
    out_refs = [combine_task.remote(*parts[q]) for q in range(n_buckets) if parts[q]]
    if not out_refs:
        out_refs = [combine_task.remote()]
    return rd.from_arrow_refs(out_refs)


def two_sided_hash_exchange(
    left_ds,
    right_ds,
    n_buckets: int,
    shard_left,
    shard_right,
    combine,
):
    """``shard_*(block, n_buckets) -> tuple[pa.Table] * n_buckets`` (must
    return schema-stable tables, including for zero-row/schemaless blocks);
    ``combine(n_left, *tables) -> pa.Table`` receives the bucket's left
    shards followed by its right shards.  Returns a Dataset of the combined
    blocks."""
    import ray
    import ray.data as rd

    shard_l = ray.remote(num_returns=n_buckets)(shard_left)
    shard_r = ray.remote(num_returns=n_buckets)(shard_right)
    per_l: list[list] = [[] for _ in range(n_buckets)]
    per_r: list[list] = [[] for _ in range(n_buckets)]
    for ds_, task, parts in ((left_ds, shard_l, per_l), (right_ds, shard_r, per_r)):
        for bundle in ds_.iter_internal_ref_bundles():
            for bref in bundle.block_refs:
                refs = task.remote(bref, n_buckets)
                for q in range(n_buckets):
                    parts[q].append(refs[q])
    combine_task = ray.remote(combine)
    out_refs = [
        combine_task.remote(len(per_l[q]), *per_l[q], *per_r[q])
        for q in range(n_buckets)
        if per_l[q] or per_r[q]
    ]
    if not out_refs:
        out_refs = [combine_task.remote(0)]
    return rd.from_arrow_refs(out_refs)
