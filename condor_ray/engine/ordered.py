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
from ..runtime import cluster_cpus
from ..stages.extract import KeyExtractor, stable_partition_order, ts_to_us
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
    order = stable_partition_order(part, n_parts)
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
    wave_fragments: int | str | None = "auto",
):
    """Fragment-path binding of ``build_windowed_wavelets`` (bit-identical
    managers): one shard task per fragment reads + routes in a single hop,
    one fused build task per window partition.  Use when the input is
    already a list of Parquet fragments (the streaming engines' source
    shape); arbitrary Datasets go through ``build_windowed_wavelets``.

    ``wave_fragments``: process fragments in bounded waves (default auto =
    4×CPU fragments/wave, engaged only when the stream is longer than one
    wave).  A cheap footer-stats pass yields each fragment's min ts; after
    wave *i*, every window older than the min ts of the REMAINING fragments
    is complete and is built + released immediately, with only open-window
    rows carried into the next wave's per-partition task.  In-flight shard
    bytes drop from O(stream) to O(wave + open windows) — at 600 M rows the
    single-shot path held ~26 GB of shards and spilled.  ``None`` forces the
    single-shot path.  Wave order is time order; out-of-order fragment lists
    degrade gracefully (threshold stops advancing) but stay correct."""
    import ray
    import ray.data as rd

    key = key or KeySpec("text", "length")
    size_us = window.size_us
    n_parts = max(2, 2 * cluster_cpus())
    shard = ray.remote(num_returns=n_parts)(_shard_wavelet_fragment)
    if wave_fragments == "auto":
        wave_fragments = 4 * cluster_cpus()
    if wave_fragments is not None and len(fragment_paths) > wave_fragments:
        return _build_wavelets_waved(
            fragment_paths, shard, columns, n_parts, size_us, size,
            parallelism, key, int(wave_fragments),
        )
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


def _build_wavelets_waved(
    paths: list[str],
    shard,
    columns,
    n_parts: int,
    size_us: int,
    size: int,
    parallelism: int,
    key: KeySpec,
    wave: int,
):
    """Wave-bounded fragment build (see ``build_windowed_wavelets_from_
    fragments``).  Per wave: shard tasks for the wave's fragments, then one
    chained task per partition that builds complete windows and carries open
    ones forward.  At most ~2 waves of shard outputs are in flight (the
    driver waits on wave i-1's builds before submitting wave i+1)."""
    import ray
    import ray.data as rd

    min_ts_task = ray.remote(num_cpus=0.25)(_fragment_min_ts)
    # footer probes in bounded chunks (not 10^5 simultaneous submissions)
    frag_min: list[int] = []
    for lo in range(0, len(paths), 4 * wave):
        frag_min.extend(
            ray.get([min_ts_task.remote(p) for p in paths[lo : lo + 4 * wave]])
        )
    # threshold after wave ending at fragment e = min ts of fragments [e:)
    suffix_min = [2**62] * (len(paths) + 1)
    for i in range(len(paths) - 1, -1, -1):
        suffix_min[i] = min(frag_min[i], suffix_min[i + 1])
    wave_build = ray.remote(num_returns=2)(_build_wavelet_wave)
    carry: list = [None] * n_parts
    emit_refs: list = []
    prev_waves: list[list] = []
    for lo in range(0, len(paths), wave):
        hi = min(lo + wave, len(paths))
        threshold_wid = (
            2**62 if hi >= len(paths) else suffix_min[hi] // size_us
        )
        per_part: list[list] = [[] for _ in range(n_parts)]
        for path in paths[lo:hi]:
            refs = shard.remote(path, columns, n_parts, size_us, key)
            for q in range(n_parts):
                per_part[q].append(refs[q])
        this_wave = []
        for q in range(n_parts):
            out, carry[q] = wave_build.remote(
                threshold_wid, size_us, size, parallelism,
                carry[q], *per_part[q],
            )
            emit_refs.append(out)
            this_wave.append(out)
        prev_waves.append(this_wave)
        if len(prev_waves) > 1:  # bound in-flight shards to ~2 waves
            done_wave = prev_waves.pop(0)
            ray.wait(done_wave, num_returns=len(done_wave), fetch_local=False)
    return rd.from_arrow_refs(emit_refs)


_EMPTY_MANAGER_TABLE = pa.table(
    {
        "window_start": pa.array([], type=pa.int64()),
        "window_end": pa.array([], type=pa.int64()),
        "n_rows": pa.array([], type=pa.int64()),
        "payload": pa.array([], type=pa.binary()),
    }
)


def _emit_windows(tbl: pa.Table, size_us: int, size: int, parallelism: int) -> pa.Table:
    """Rows (window_id, ts, conv_id, turn_idx, value) -> one manager row per
    window.  ONE lexsort establishes every window's (ts, conv_id, turn_idx)
    order, then each window segment round-robin splits into P sub-wavelets
    (C kernel) and assembles its manager — bit-identical to the groupby
    formulation (a sort of any superset of whole windows yields the same
    per-window segment order)."""
    if tbl.num_rows == 0:
        return _EMPTY_MANAGER_TABLE
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


def _build_wavelet_partition(
    size_us: int, size: int, parallelism: int, *tables: pa.Table
) -> pa.Table:
    """Fused per-partition conquer over the partition's FULL row set."""
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _EMPTY_MANAGER_TABLE
    return _emit_windows(pa.concat_tables(tables), size_us, size, parallelism)


def _build_wavelet_wave(
    threshold_wid: int,
    size_us: int,
    size: int,
    parallelism: int,
    carry: pa.Table | None,
    *tables: pa.Table,
):
    """One wave of a partition's conquer: build every COMPLETE window
    (window_id < threshold_wid — no remaining fragment can contribute to
    it), return (manager rows, carryover of still-open-window rows).  The
    carryover chains into the next wave's task, so in-flight shard bytes
    stay O(wave), not O(stream) — the 600 M-row spill fix."""
    import pyarrow.compute as pc

    parts = [t for t in ((carry,) + tables) if t is not None and t.num_rows]
    if not parts:
        return _EMPTY_MANAGER_TABLE, None
    tbl = pa.concat_tables(parts)
    done_mask = pc.less(tbl["window_id"], threshold_wid)
    done = tbl.filter(done_mask)
    keep = tbl.filter(pc.invert(done_mask))
    out = _emit_windows(done, size_us, size, parallelism)
    return out, (keep.combine_chunks() if keep.num_rows else None)


def _fragment_min_ts(path: str) -> int:
    """Min epoch-µs ts of one fragment from the Parquet FOOTER statistics
    (no data pages read); falls back to reading the ts column when a row
    group lacks stats.  2**62 for empty fragments."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    md = f.metadata
    col_idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).path == "ts":
            col_idx = i
            break
    mins: list[int] = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        if g.num_rows == 0:
            continue
        st = g.column(col_idx).statistics if col_idx is not None else None
        if st is None or not st.has_min_max:
            ts = ts_to_us(f.read(columns=["ts"])["ts"])
            return int(ts.min()) if len(ts) else 2**62
        m = st.min
        if not isinstance(m, (int, np.integer)):
            m = pd.Timestamp(m).value // 1000  # datetime stat -> epoch µs
        mins.append(int(m))
    return min(mins) if mins else 2**62


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

        n_parts = max(2, 2 * cluster_cpus())
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

    built = substreams.repartition(4 * cluster_cpus()).map_batches(
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
