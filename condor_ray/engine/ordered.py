"""Order-based (non-mergeable) synopsis path: windowed Haar wavelets.

Reference plan (``buildScottyNonMergeable``, conn/.../processor/
SynopsisBuilder.java:345-362): a parallelism-1 ``OrderAndIndex`` operator
assigns round-robin keys in timestamp order (conn/.../processor/divide/
OrderAndIndex.java:13-68), P keyed wavelet builders consume their substream,
and a unifier collects the P partials into a ``DistributedWaveletsManager``
whose index arithmetic (synopsis = i % P, local = i // P) reconstructs global
stream positions.

Ray-Data-first version: the ordering invariant is made EXPLICIT instead of
relying on arrival order — within each window, rows are sorted by
``(ts, conv_id, turn_idx)`` (the stable per-turn order of the BASELINE
per-row invariant), then round-robin split into P wavelets.  Windows build in
parallel via ``groupby(window).map_groups``; parallelism WITHIN a window
follows the reference's index contract so point/range queries agree with a
sequential build.  FiFo / biased samplers (timestamped path) reuse the
mergeable engine since their merge handles ordering by timestamp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import KeySpec
from ..stages.extract import KeyExtractor, ts_to_us
from ..synopses.base import Synopsis
from ..synopses.wavelets import DistributedWaveletsManager, WaveletSynopsis
from ..windows import TumblingWindow


def _shard_wavelet_block(
    tbl: pa.Table, n_parts: int, size_us: int, key_spec: KeySpec
):
    """One input block -> n_parts shards routed by window_id % n_parts.
    Carries only (window_id, ts, conv_id, turn_idx, value) onto the wire."""
    if isinstance(tbl, pd.DataFrame):  # Ray Data blocks may be pandas
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0 or "ts" not in tbl.schema.names:
        # zero-row blocks can arrive schemaless (no columns at all)
        empty = pa.table(
            {
                "window_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.float64()),
            }
        )
        return tuple(empty for _ in range(n_parts))
    ts = ts_to_us(tbl["ts"])
    values = KeyExtractor(key_spec)(tbl).astype(np.float64)
    wid = ts // size_us
    turn = tbl["turn_idx"].to_numpy()
    conv = tbl["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    part = wid % n_parts
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
    out = []
    for q in range(n_parts):
        sel = order[bounds[q] : bounds[q + 1]]
        out.append(
            pa.table(
                {
                    "window_id": pa.array(wid[sel], type=pa.int64()),
                    "ts": pa.array(ts[sel], type=pa.int64()),
                    "conv_id": conv.take(pa.array(sel)),
                    "turn_idx": pa.array(turn[sel]),
                    "value": pa.array(values[sel], type=pa.float64()),
                }
            )
        )
    return tuple(out)


def _shard_wavelet_fragment(
    path: str,
    columns: list[str] | None,
    n_parts: int,
    size_us: int,
    key_spec: KeySpec,
):
    """Path-based shard task: reads the fragment itself (one pruned
    pq.read_table) instead of receiving a block from a Ray Data read stage
    — skips the ReadParquet operator's block-build + object-store round
    trip, which dominated the job once the build kernel got cheap."""
    import pyarrow.parquet as pq

    return _shard_wavelet_block(
        pq.read_table(path, columns=columns), n_parts, size_us, key_spec
    )


def build_windowed_wavelets_from_fragments(
    fragment_paths: list[str],
    window: TumblingWindow,
    size: int = 1000,
    parallelism: int = 4,
    key: KeySpec | None = None,
    columns: list[str] | None = None,
):
    """Fragment-path binding of ``build_windowed_wavelets`` (bit-identical
    managers): one shard task per fragment reads + routes in a single hop,
    one fused build task per window partition.  Use when the input is
    already a list of Parquet fragments (the streaming engines' source
    shape); arbitrary Datasets go through ``build_windowed_wavelets``."""
    import ray
    import ray.data as rd

    key = key or KeySpec("text", "length")
    size_us = window.size_us
    ncpu = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    n_parts = max(2, 2 * ncpu)
    shard = ray.remote(num_returns=n_parts)(_shard_wavelet_fragment)
    per_part: list[list] = [[] for _ in range(n_parts)]
    for path in fragment_paths:
        refs = shard.remote(path, columns, n_parts, size_us, key)
        for q in range(n_parts):
            per_part[q].append(refs[q])
    build = ray.remote(_build_wavelet_partition)
    out_refs = [
        build.remote(size_us, size, parallelism, *per_part[q])
        for q in range(n_parts)
        if per_part[q]
    ]
    if not out_refs:
        out_refs = [build.remote(size_us, size, parallelism)]
    return rd.from_arrow_refs(out_refs)


def _build_wavelet_partition(
    size_us: int, size: int, parallelism: int, *tables: pa.Table
) -> pa.Table:
    """Fused per-partition conquer: ONE lexsort over the partition's rows
    establishes every window's (ts, conv_id, turn_idx) order, then each
    window segment round-robin splits into P sub-wavelets (C kernel) and
    assembles its manager — bit-identical to the groupby formulation."""
    tables = [t for t in tables if t.num_rows]
    empty = pa.table(
        {
            "window_start": pa.array([], type=pa.int64()),
            "window_end": pa.array([], type=pa.int64()),
            "n_rows": pa.array([], type=pa.int64()),
            "payload": pa.array([], type=pa.binary()),
        }
    )
    if not tables:
        return empty
    tbl = pa.concat_tables(tables)
    # Arrow's native multi-key sort: C++ string compares for the conv_id
    # tie-break (6x faster than np.unique-codes + np.lexsort on object
    # arrays, order-identical — rows tied on all four keys are
    # interchangeable since (conv_id, turn_idx) identifies a turn)
    import pyarrow.compute as pc

    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("window_id", "ascending"),
            ("ts", "ascending"),
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
        ],
    ).to_numpy()
    wid_s = tbl["window_id"].to_numpy()[order]
    val_s = tbl["value"].to_numpy()[order]
    bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(wid_s)) + 1, [len(wid_s)])
    )
    ws, we, nr, payloads = [], [], [], []
    for b in range(len(bounds) - 1):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        vals = val_s[lo:hi]
        mgr = DistributedWaveletsManager(0, None)
        for p in range(parallelism):
            w = WaveletSynopsis(size)
            w.update_batch(np.ascontiguousarray(vals[p::parallelism]))
            mgr.add_synopsis(w)
        w0 = int(wid_s[lo])
        ws.append(w0 * size_us)
        we.append(w0 * size_us + size_us)
        nr.append(hi - lo)
        payloads.append(mgr.to_bytes())
    return pa.table(
        {
            "window_start": pa.array(ws, type=pa.int64()),
            "window_end": pa.array(we, type=pa.int64()),
            "n_rows": pa.array(nr, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def build_windowed_wavelets(
    ds,
    window: TumblingWindow,
    size: int = 1000,
    parallelism: int = 4,
    key: KeySpec | None = None,
    intra_window_parallel: bool = True,
    mode: str = "partition",
):
    """Dataset -> one DistributedWaveletsManager per tumbling window.

    Output: window_start, window_end (int64 us), n_rows, payload (manager).

    ``mode="partition"`` (default): explicit task-based hash exchange —
    every input block shards by ``window_id % n_parts`` (``num_returns``
    fan-out straight through the object store), and one fused task per
    partition sorts/builds/assembles ALL of its windows with a single
    lexsort.  Rows cross the wire exactly once and never enter Ray Data's
    sort-based groupby (whose range-sample + per-block sort + merge
    machinery dominated the job once the C kernel made the tree build
    cheap: 8->32 CPU efficiency fell to 0.43 through the global exchange).

    ``mode="group"``: the Ray Data ``groupby(window_id)`` formulation.
    ``intra_window_parallel=True`` there splits each window into P
    round-robin substreams built in separate tasks — the path to keep for
    EXTREME single-window skew, where one window outweighs whole
    partitions.  All modes produce BIT-IDENTICAL managers (same
    (ts, conv_id, turn_idx) order, same round-robin index contract)."""
    key = key or KeySpec("text", "length")
    size_us = window.size_us
    extractor = KeyExtractor(key)

    if mode == "partition":
        import ray
        import ray.data as rd

        ncpu = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        n_parts = max(2, 2 * ncpu)
        shard = ray.remote(num_returns=n_parts)(_shard_wavelet_block)
        per_part: list[list] = [[] for _ in range(n_parts)]
        for bundle in ds.iter_internal_ref_bundles():
            for bref in bundle.block_refs:
                refs = shard.remote(bref, n_parts, size_us, key)
                for q in range(n_parts):
                    per_part[q].append(refs[q])
        build = ray.remote(_build_wavelet_partition)
        out_refs = [
            build.remote(size_us, size, parallelism, *per_part[q])
            for q in range(n_parts)
            if per_part[q]
        ]
        if not out_refs:
            out_refs = [build.remote(size_us, size, parallelism)]
        return rd.from_arrow_refs(out_refs)

    def add_window(batch: pa.Table) -> pa.Table:
        ts = ts_to_us(batch["ts"])
        values = extractor(batch).astype(np.float64)
        return pa.table(
            {
                "window_id": pa.array(ts // size_us, type=pa.int64()),
                "ts": pa.array(ts, type=pa.int64()),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "value": pa.array(values, type=pa.float64()),
            }
        )

    prepared = ds.map_batches(add_window, batch_format="pyarrow")

    if not intra_window_parallel:

        def build_window(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
            values = g["value"].to_numpy()
            mgr = DistributedWaveletsManager(0, None)
            for p in range(parallelism):
                w = WaveletSynopsis(size)
                w.update_batch(np.ascontiguousarray(values[p::parallelism]))
                mgr.add_synopsis(w)
            wid = int(g["window_id"].iloc[0])
            return pd.DataFrame(
                {
                    "window_start": [wid * size_us],
                    "window_end": [wid * size_us + size_us],
                    "n_rows": [len(values)],
                    "payload": [mgr.to_bytes()],
                }
            )

        return prepared.groupby("window_id").map_groups(
            build_window, batch_format="pandas"
        )

    # Stage A (cheap): per window, establish the global stream order and cut
    # it into P round-robin substreams — one output row per (window, p).
    # Stage B (the compute-heavy tree build) then runs P tasks PER WINDOW
    # instead of one, so a hot window no longer serializes on one core and
    # the job scales with cores, not with window count.
    def split_window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        values = g["value"].to_numpy()
        wid = int(g["window_id"].iloc[0])
        return pd.DataFrame(
            {
                "window_id": np.full(parallelism, wid, dtype=np.int64),
                "p": np.arange(parallelism, dtype=np.int64),
                "values": [values[p::parallelism] for p in range(parallelism)],
                "n_sub": [len(values[p::parallelism]) for p in range(parallelism)],
            }
        )

    substreams = prepared.groupby("window_id").map_groups(
        split_window, batch_format="pandas"
    )

    def build_subs(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for vals in df["values"]:
            w = WaveletSynopsis(size)
            w.update_batch(np.asarray(vals, dtype=np.float64))
            payloads.append(w.to_bytes())
        return pd.DataFrame(
            {
                "window_id": df["window_id"].astype(np.int64).to_numpy(),
                "p": df["p"].astype(np.int64).to_numpy(),
                "n_sub": df["n_sub"].astype(np.int64).to_numpy(),
                "payload": payloads,
            }
        )

    # one row per (window, p) already — a block SPLIT (no sort exchange)
    # spreads the sub-builds over 4 tasks per core; measured best at 4*ncpu
    # blocks (1-row blocks paid more in block/repartition overhead than the
    # straggler tail they removed)
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    built = substreams.repartition(4 * ncpu).map_batches(
        build_subs, batch_format="pandas", batch_size=1
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("p")
        mgr = DistributedWaveletsManager(0, None)
        for b in g["payload"]:
            mgr.add_synopsis(Synopsis.from_bytes(b))
        wid = int(g["window_id"].iloc[0])
        return pd.DataFrame(
            {
                "window_start": [wid * size_us],
                "window_end": [wid * size_us + size_us],
                "n_rows": [int(g["n_sub"].sum())],
                "payload": [mgr.to_bytes()],
            }
        )

    return built.groupby("window_id").map_groups(assemble, batch_format="pandas")


def wavelet_range_sums(ds, window: TumblingWindow, ranges, **kwargs):
    """Evaluate range-sum queries against each window's wavelet manager.

    ``ranges``: list of (left_frac, right_frac) in [0, 1] of the window's
    element count.  Returns window_start, left, right, range_sum."""
    syn = build_windowed_wavelets(ds, window, **kwargs)

    def evaluate(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in df.iterrows():
            mgr = Synopsis.from_bytes(r["payload"])
            n = int(r["n_rows"])
            if n == 0:
                continue
            for lf, rf in ranges:
                li = min(int(lf * n), n - 1)
                ri = min(int(rf * n), n - 1)
                rows.append(
                    {
                        "window_start": int(r["window_start"]),
                        "left": li,
                        "right": ri,
                        "range_sum": mgr.range_sum_query(li, ri),
                    }
                )
        return pd.DataFrame(
            rows, columns=["window_start", "left", "right", "range_sum"]
        )

    return syn.map_batches(evaluate, batch_format="pandas")
