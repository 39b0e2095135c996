"""Oracle-backed driver pipelines for every synopsis kernel.

Round-1 gap (VERDICT "Next round" #1): 8 of the 12 synopses were verified
only by pytest, never by the driver's DuckDB gate.  Each pipeline here runs
the FULL engine path (map_batches partials -> slice merge -> window merge via
``build_windowed_synopses``) and emits SQL-expressible columns:

- exact quantities the sketch carries exactly (EquiWidth bucket counts,
  sampler membership with oversized reservoirs, BASH total frequencies,
  Bloom/Cuckoo membership with collision-free sizing) -> direct value oracle;
- approximate quantities (DDSketch quantiles, AGMS F2) -> the Ray side emits
  the EXACT value (computed independently with exact Ray aggregation, so the
  oracle still verifies real work) plus a ``within_bound`` boolean asserting
  the sketch estimate meets its accuracy contract; the oracle's boolean is
  constant true, so a broken kernel flips the hash.

Reference anchors: EquiWidthHistogramAccuracy.java:50-51,
ReservoirSamplingAccuracy.java, bench:efficiency/oneOffImplementation/
classification/*.java (each exercises one synopsis end-to-end).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import BuildConfiguration, KeySpec
from ..engine.batch import build_windowed_synopses
from ..hashing import java_string_hash_array
from ..stages.extract import ts_to_us
from ..synopses.base import Synopsis
from ..windows import TumblingWindow
from .core import window_key_partials

TOOL_UNIVERSE = [f"tool_{i}" for i in range(20)]
GHOSTS = [f"ghost_{i}" for i in range(8)]


def _tool_rows(ds):
    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tool"])), batch_format="pyarrow"
    )


def _window_tool_counts(ds, window: TumblingWindow) -> pd.DataFrame:
    """Exact (window_start, tool, cnt) — partial counts per batch, tiny
    groupby, collected (result is #windows x #tools rows)."""
    size_us = window.size_us

    def pairs(batch: pa.Table) -> pa.Table:
        wid, tool, counts = window_key_partials(
            batch, "tool", size_us, with_counts=True
        )
        return pa.table(
            {
                "window_start": pa.array(wid * size_us, type=pa.int64()),
                "tool": tool,
                "cnt": pa.array(counts, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(pairs, batch_format="pyarrow")
        # coalesce the O(windows x tools)-row partials before the groupby so
        # the sort-shuffle doesn't pay one reduce task per input block
        .repartition(8)
        .groupby(["window_start", "tool"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    return out


# -- 1. EquiWidth histogram: exact bucket counts ---------------------------

EW_LO, EW_HI, EW_BUCKETS = 0, 128, 32
_EW_BL = (EW_HI - EW_LO) / EW_BUCKETS


def equiwidth_hist_buckets(ds, window: TumblingWindow):
    """Per-window EquiWidthHistogram over text length; bucket counts are
    exact (mergeable int counts), so the oracle is SQL GROUP BY floor."""
    cfg = BuildConfiguration(
        synopsis="EquiWidthHistogram",
        params=(EW_LO, EW_HI, EW_BUCKETS),
        windows=[window],
        key=KeySpec("text", "length"),
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ws, bk, fr = [], [], []
        for _, r in df.iterrows():
            h = Synopsis.from_bytes(r["payload"])
            nz = np.flatnonzero(h.frequency)
            ws.extend([int(r["window_start"])] * len(nz))
            bk.extend(nz.tolist())
            fr.extend(h.frequency[nz].tolist())
        return pd.DataFrame(
            {
                "window_start": np.asarray(ws, dtype=np.int64),
                "bucket": np.asarray(bk, dtype=np.int64),
                "freq": np.asarray(fr, dtype=np.int64),
            }
        )

    return syn.map_batches(explode, batch_format="pandas")


def equiwidth_sql(cte: str, w_us: int) -> str:
    return f"""{cte}
SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start,
       CAST(floor((length(text) - {EW_LO}) / {_EW_BL}) AS BIGINT) AS bucket,
       count(*) AS freq
FROM transcripts
WHERE length(text) >= {EW_LO} AND length(text) < {EW_HI}
GROUP BY 1, 2"""


# -- 2. Bloom filter membership --------------------------------------------

def bloom_membership(ds, window: TumblingWindow):
    """Per-window Bloom filter over tool names, probed with the 20-name tool
    universe + 8 never-inserted ghosts.  Sized collision-free (65536 bits for
    <=20 keys), so present == exact membership (Bloom has no false
    negatives; false positives are eliminated by sizing).

    Layout-invariance: each window's filter is built by a SINGLE builder
    from the window's distinct keys (windows hash-partition into O(cores)
    groups) — the reference's AND-merge quirk makes a MERGED bloom's
    membership depend on how rows split across partials (a key missing from
    any partial is ANDed away), i.e. on block layout; the quirk itself
    stays covered by the merge-algebra property tests."""
    from ..runtime import default_n_parts
    from ..synopses.registry import make_synopsis

    size_us = window.size_us
    n_parts = default_n_parts()
    probes = TOOL_UNIVERSE + GHOSTS
    probe_keys = java_string_hash_array(probes)

    def pairs(batch: pa.Table) -> pa.Table:
        uw, tool, _ = window_key_partials(batch, "tool", size_us)
        return pa.table(
            {
                "wid": pa.array(uw),
                "tool": tool,
                "part": pa.array(
                    (uw % n_parts).astype(np.int32)
                ),
            }
        )

    def build_and_probe(g: pd.DataFrame) -> pd.DataFrame:
        wid = g["wid"].to_numpy(np.int64)
        keys = java_string_hash_array(g["tool"].tolist())
        order = np.argsort(wid, kind="stable")
        wid, keys = wid[order], keys[order]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(wid))[0] + 1, [len(wid)]]
        )
        ws, names, present = [], [], []
        for b in range(len(bounds) - 1):  # bounded: windows per partition
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            bf = make_synopsis("BloomFilter", (1024, 65536, 7))
            bf.update_batch(keys[lo:hi])
            hits = bf.query_batch(probe_keys)
            ws.extend([int(wid[lo]) * size_us] * len(probes))
            names.extend(probes)
            present.extend(np.asarray(hits, dtype=bool).tolist())
        return pd.DataFrame(
            {
                "window_start": np.asarray(ws, dtype=np.int64),
                "probe": np.asarray(names, dtype=object),
                "present": np.asarray(present, dtype=bool),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: build_and_probe(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )


def _universe_sql(include_ghosts: bool) -> str:
    rows = [f"('{t}')" for t in TOOL_UNIVERSE]
    if include_ghosts:
        rows += [f"('{g}')" for g in GHOSTS]
    return "(VALUES " + ", ".join(rows) + ") AS u(probe)"


def bloom_sql(cte: str, w_us: int) -> str:
    return f"""{cte},
wt AS (
  SELECT DISTINCT (epoch_us(ts) // {w_us}) * {w_us} AS window_start, tool
  FROM transcripts WHERE tool IS NOT NULL
),
wins AS (SELECT DISTINCT window_start FROM wt)
SELECT w.window_start, u.probe, (wt.tool IS NOT NULL) AS present
FROM wins w
CROSS JOIN {_universe_sql(True)}
LEFT JOIN wt ON wt.window_start = w.window_start AND wt.tool = u.probe"""


# -- 3. Cuckoo filter membership + delete ----------------------------------

def cuckoo_membership(ds, window: TumblingWindow):
    """Per-window Cuckoo filter over the DISTINCT tools of the window;
    even-numbered tools are then deleted; probing the universe yields
    present == (tool in window AND odd).  Exercises insert, merge, delete,
    and lookup end-to-end (collision-free with 16-bit fingerprints over a
    20-name universe)."""
    size_us = window.size_us
    wt = _window_tool_counts(ds, window)

    # one representative transcript-shaped row per (window, tool): ts at the
    # window start places it in the right window deterministically
    reps = pa.table(
        {
            "conv_id": pa.array(["r"] * len(wt)),
            "turn_idx": pa.array(np.zeros(len(wt), dtype=np.int32)),
            "tool": pa.array(wt["tool"].tolist(), type=pa.string()),
            "ts": pa.array(
                wt["window_start"].to_numpy(np.int64), type=pa.timestamp("us")
            ),
        }
    )
    import ray.data as rd

    cfg = BuildConfiguration(
        synopsis="CuckooFilter",
        params=(4, 256, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
    )
    syn = build_windowed_synopses(rd.from_arrow(reps), cfg, concurrency=1).to_pandas()

    probe_keys = java_string_hash_array(TOOL_UNIVERSE)
    by_window: dict[int, set[str]] = {}
    for ws, tool in zip(wt["window_start"].tolist(), wt["tool"].tolist()):
        by_window.setdefault(int(ws), set()).add(tool)

    # "even-numbered" is defined only for names shaped tool_<int> (the
    # events-adapter universe, same rule as the SQL twin's substr cast);
    # other observed names simply stay in the filter instead of crashing
    # the parse.
    tool_num = re.compile(r"^tool_(\d+)$")
    ws_out, names, present = [], [], []
    for _, r in syn.iterrows():
        cf = Synopsis.from_bytes(r["payload"])
        w = int(r["window_start"])
        for tool in sorted(by_window.get(w, ())):
            m = tool_num.match(tool)
            if m and int(m.group(1)) % 2 == 0:
                cf.delete(int(java_string_hash_array([tool])[0]))
        hits = cf.lookup_batch(probe_keys)
        ws_out.extend([w] * len(TOOL_UNIVERSE))
        names.extend(TOOL_UNIVERSE)
        present.extend(np.asarray(hits, dtype=bool).tolist())
    return pd.DataFrame(
        {
            "window_start": np.asarray(ws_out, dtype=np.int64),
            "tool": np.asarray(names, dtype=object),
            "present": np.asarray(present, dtype=bool),
        }
    )


def cuckoo_sql(cte: str, w_us: int) -> str:
    return f"""{cte},
wt AS (
  SELECT DISTINCT (epoch_us(ts) // {w_us}) * {w_us} AS window_start, tool
  FROM transcripts WHERE tool IS NOT NULL
),
wins AS (SELECT DISTINCT window_start FROM wt)
SELECT w.window_start, u.probe AS tool,
       (wt.tool IS NOT NULL
        AND CAST(substr(u.probe, 6) AS INTEGER) % 2 = 1) AS present
FROM wins w
CROSS JOIN {_universe_sql(False)}
LEFT JOIN wt ON wt.window_start = w.window_start AND wt.tool = u.probe"""


# -- 4. DDSketch quantiles --------------------------------------------------

DD_QS = (0.5, 0.9, 0.99)
DD_ALPHA = 0.01


def ddsketch_quantile_check(ds, window: TumblingWindow):
    """Per-window DDSketch over text length.  Emits the EXACT rank-based
    quantile (verified by the SQL oracle) plus ``within_bound`` asserting the
    sketch's relative-accuracy contract |est - exact| <= alpha * exact."""
    size_us = window.size_us
    cfg = BuildConfiguration(
        synopsis="DDSketch",
        params=(DD_ALPHA, 4096),
        windows=[window],
        key=KeySpec("text", "length"),
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2).to_pandas()

    # exact per-(window, length) counts via partial aggregation
    def pairs(batch: pa.Table) -> pa.Table:
        ts = ts_to_us(batch["ts"])
        wid = ts // size_us
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ln = pc.utf8_length(col).cast(pa.int64()).to_numpy()
        m = int(ln.max()) + 1 if len(ln) else 1
        gkey = wid * m + ln
        uniq, counts = np.unique(gkey, return_counts=True)
        return pa.table(
            {
                "window_start": pa.array((uniq // m) * size_us, type=pa.int64()),
                "len": pa.array(uniq % m, type=pa.int64()),
                "cnt": pa.array(counts, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(pairs, batch_format="pyarrow")
        # same partials-coalesce as the tool-frequency path above
        .repartition(8)
        .groupby(["window_start", "len"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    rows = []
    for ws, grp in exact.groupby("window_start"):
        grp = grp.sort_values("len")
        lens = grp["len"].to_numpy(np.int64)
        cum = np.cumsum(grp["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        row = syn[syn["window_start"] == ws]
        sk = Synopsis.from_bytes(row["payload"].iloc[0])
        for q in DD_QS:
            rank = int(q * (n - 1))
            exact_q = float(lens[np.searchsorted(cum, rank + 1)])
            est = sk.get_value_at_quantile(q)
            ok = abs(est - exact_q) <= DD_ALPHA * exact_q + 1e-9
            rows.append((int(ws), float(q), exact_q, bool(ok)))
    out = pd.DataFrame(rows, columns=["window_start", "q", "exact_q", "within_bound"])
    return out.astype(
        {"window_start": np.int64, "q": np.float64, "exact_q": np.float64,
         "within_bound": bool}
    )


def ddsketch_sql(cte: str, w_us: int) -> str:
    q_selects = []
    for q in DD_QS:
        q_selects.append(
            f"""SELECT window_start, {q} AS q, CAST(len AS DOUBLE) AS exact_q,
       true AS within_bound
FROM ranked WHERE rk = CAST(floor({q} * (n - 1)) AS BIGINT)"""
        )
    union = "\nUNION ALL\n".join(q_selects)
    return f"""{cte},
base AS (
  SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start,
         length(text) AS len
  FROM transcripts
),
ranked AS (
  SELECT window_start, len,
         row_number() OVER (PARTITION BY window_start ORDER BY len) - 1 AS rk,
         count(*) OVER (PARTITION BY window_start) AS n
  FROM base
)
{union}"""


# -- 5. Fast-AGMS F2 --------------------------------------------------------

AGMS_REL_TOL = 0.15


def agms_f2_check(ds, window: TumblingWindow):
    """Per-window Fast-AGMS over tool keys.  Emits the EXACT second frequency
    moment (oracle: SUM(cnt^2)) plus ``within_bound`` asserting the seeded
    sketch estimate lands within {AGMS_REL_TOL:.0%} relative error."""
    cfg = BuildConfiguration(
        synopsis="FastAGMS",
        params=(4096, 5, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
    )
    syn = build_windowed_synopses(_tool_rows(ds), cfg, concurrency=2).to_pandas()
    wt = _window_tool_counts(ds, window)
    f2 = (
        wt.assign(sq=wt["cnt"] ** 2)
        .groupby("window_start", as_index=False)["sq"]
        .sum()
        .rename(columns={"sq": "exact_f2"})
    )
    merged = f2.merge(syn[["window_start", "payload"]], on="window_start")
    ests = np.asarray(
        [Synopsis.from_bytes(b).estimate_f2() for b in merged["payload"]],
        dtype=np.float64,
    )
    exact = merged["exact_f2"].to_numpy(np.float64)
    ok = np.abs(ests - exact) <= AGMS_REL_TOL * exact
    return pd.DataFrame(
        {
            "window_start": merged["window_start"].to_numpy(np.int64),
            "exact_f2": exact.astype(np.int64),
            "within_bound": ok.astype(bool),
        }
    )


def agms_sql(cte: str, w_us: int) -> str:
    return f"""{cte},
counts AS (
  SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start, tool,
         count(*) AS c
  FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2
)
SELECT window_start, CAST(sum(c * c) AS BIGINT) AS exact_f2,
       true AS within_bound
FROM counts GROUP BY 1"""


# -- 6/7. Reservoir + biased reservoir membership ---------------------------

SAMPLER_K = 4096  # > max per-window rows at gate scale -> sample == window


def _sample_membership(ds, window: TumblingWindow, synopsis: str):
    """With reservoir size > window row count, neither update nor the
    weighted/newest-first merges ever evict, so the final sample is exactly
    the window's element multiset — SQL-verifiable membership while still
    running the full seeded sampler + merge code paths."""
    cfg = BuildConfiguration(
        synopsis=synopsis,
        params=(SAMPLER_K, 7),
        windows=[window],
        sample_elements=True,
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ws, els = [], []
        for _, r in df.iterrows():
            s = Synopsis.from_bytes(r["payload"])
            for el in s.get_sample():
                ws.append(int(r["window_start"]))
                els.append(el.value if hasattr(el, "value") else el)
        return pd.DataFrame(
            {
                "window_start": np.asarray(ws, dtype=np.int64),
                "element": np.asarray(els, dtype=object),
            }
        )

    return syn.map_batches(explode, batch_format="pandas")


def reservoir_window_sample(ds, window: TumblingWindow):
    return _sample_membership(ds, window, "ReservoirSampler")


def biased_window_sample(ds, window: TumblingWindow):
    return _sample_membership(ds, window, "BiasedReservoirSampler")


def sample_membership_sql(cte: str, w_us: int) -> str:
    return f"""{cte}
SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start,
       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS element
FROM transcripts"""


# -- 8. BASH (bar-splitting equi-depth) ------------------------------------

BASH_P, BASH_BUCKETS = 7, 8


def bash_total_check(ds, window: TumblingWindow):
    """Per-window BarSplittingHistogram over text length.  The total
    frequency is carried exactly through bar splits and merges (oracle:
    COUNT(*)); ``edh_total`` round-trips it through
    build_equi_depth_histogram, and ``boundaries_ok`` asserts the equi-depth
    boundaries are monotone (full-domain range_query is exercised in pytest —
    discrete length distributions can produce degenerate repeated boundaries
    where the reference's interpolation divides 0/0).

    Layout-invariance: each window's BASH is built by a SINGLE builder over
    the window's values in deterministic (ts, conv_id, turn_idx) order —
    bar layout (and therefore the derived equi-depth histogram) depends on
    insertion/merge order, so the merged-partials path varies with block
    layout; BASH split/merge semantics stay covered by their pytest suite.
    """
    from ..runtime import default_n_parts
    from ..synopses.registry import make_synopsis

    size_us = window.size_us
    n_parts = default_n_parts()

    def rows(batch: pa.Table) -> pa.Table:
        ts = ts_to_us(batch["ts"])
        wid = ts // size_us
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                "wid": pa.array(wid),
                "ts": pa.array(ts),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "length": pc.utf8_length(text).cast(pa.int64()),
                "part": pa.array((wid % n_parts).astype(np.int32)),
            }
        )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        wid = g["wid"].to_numpy(np.int64)
        order = np.lexsort(
            (
                g["turn_idx"].to_numpy(),
                g["conv_id"].to_numpy(),
                g["ts"].to_numpy(np.int64),
                wid,
            )
        )
        wid = wid[order]
        vals = g["length"].to_numpy(np.int64)[order]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(wid))[0] + 1, [len(wid)]]
        )
        ws, totals, edh_totals, b_ok = [], [], [], []
        for b in range(len(bounds) - 1):  # bounded: windows per partition
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            h = make_synopsis("BarSplittingHistogram", (BASH_P, BASH_BUCKETS))
            h.update_batch(vals[lo:hi])
            ws.append(int(wid[lo]) * size_us)
            totals.append(int(round(h.total_frequencies)))
            ed = h.build_equi_depth_histogram()
            if ed is None:
                edh_totals.append(0)
                b_ok.append(False)
            else:
                edh_totals.append(int(round(ed.total_frequencies)))
                b_ok.append(
                    bool(
                        np.all(np.diff(ed.left_boundaries) >= 0)
                        and ed.right_most_boundary >= ed.left_boundaries[-1]
                    )
                )
        return pd.DataFrame(
            {
                "window_start": np.asarray(ws, dtype=np.int64),
                "total": np.asarray(totals, dtype=np.int64),
                "edh_total": np.asarray(edh_totals, dtype=np.int64),
                "boundaries_ok": np.asarray(b_ok, dtype=bool),
            }
        )

    return (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: build(g.drop(columns=["part"])), batch_format="pandas"
        )
    )


def bash_sql(cte: str, w_us: int) -> str:
    return f"""{cte}
SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start,
       count(*) AS total,
       count(*) AS edh_total,
       true AS boundaries_ok
FROM transcripts GROUP BY 1"""


# -- 9. queryLatest driver entry --------------------------------------------

def query_latest_cm(ds, window: TumblingWindow):
    """queryLatest evaluation (ApproximateDataAnalytics.queryLatest): the
    20-tool universe queries the LATEST window's CM sketch; collision-free
    sizing makes estimates exact (absent tools -> 0)."""
    import ray.data as rd

    from ..evaluate.queries import query_count_min, query_latest

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
    )
    syn = build_windowed_synopses(_tool_rows(ds), cfg, concurrency=2)
    queries = rd.from_items(
        [
            {"query_key": int(k), "tool": t}
            for t, k in zip(TOOL_UNIVERSE, java_string_hash_array(TOOL_UNIVERSE))
        ]
    )
    out = query_latest(queries, syn, query_count_min).to_pandas()
    return pd.DataFrame(
        {
            "tool": out["tool"].to_numpy(object),
            "window_start": out["window_start"].astype(np.int64),
            "est": out["result"].astype(np.int64),
        }
    )


def streaming_windowed_topk_tools(sf_dir: str, window: TumblingWindow,
                                  k: int = 5, parallelism: int = 4):
    """Windowed heavy hitters through the STREAMING engine: a tool-stratified
    streaming job emits exact per-(window, tool) counts at window close
    (partials merge per stratum across partitions/fragments); the bounded
    emission then ranks top-k per window.  Shares ``windowed_topk_tools``'
    QUALIFY row_number oracle."""
    import tempfile

    from ..engine.streaming import StreamingSynopsisJob

    frags = _tool_stream_fragments(sf_dir)
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(1024, 3, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
        stratify_by="tool",
        parallelism=parallelism,
    )
    out_dir = tempfile.mkdtemp(prefix="condor_stopk_")
    job = StreamingSynopsisJob(cfg, out_dir, columns=["conv_id", "tool", "ts"])
    job.run(frags)
    out = job.result_dataset().to_pandas()  # bounded: windows x tools rows
    job.shutdown()
    out = (
        out[["window_start", "stratum", "n_rows"]]
        .rename(columns={"stratum": "tool", "n_rows": "n"})
        .astype({"window_start": np.int64, "n": np.int64})
        .sort_values(
            ["window_start", "n", "tool"], ascending=[True, False, True],
            kind="mergesort",
        )
    )
    rank = out.groupby("window_start", sort=False).cumcount() + 1
    out = out[rank <= k].reset_index(drop=True)
    out["rank"] = rank[rank <= k].to_numpy(np.int64)
    return out[["window_start", "rank", "tool", "n"]]


def _tool_stream_fragments(sf_dir: str) -> list[str]:
    """ts-ordered tool-row fragments (tool IS NOT NULL), cached per sf_dir."""
    import os

    import pyarrow.parquet as pq

    from .core import cached_event_stream_fragments

    frags = cached_event_stream_fragments(sf_dir)

    def build(cache: str) -> None:
        for f in frags:
            t = pq.read_table(f, columns=["conv_id", "tool", "ts"])
            t = t.filter(pc.is_valid(t["tool"]))
            # tmp + rename: two concurrent gate runs may both miss _DONE;
            # atomic replace keeps a reader from seeing a half-written file
            dst = os.path.join(cache, os.path.basename(f))
            tmp = f"{dst}.tmp-{os.getpid()}"
            pq.write_table(t, tmp)
            os.replace(tmp, dst)

    from .core import cached_fragment_dir

    return cached_fragment_dir("tool_stream_v2", sf_dir, build)


def streaming_query_latest_cm(sf_dir: str, window: TumblingWindow):
    """CONTINUOUS queryLatest: the 20-tool standing query set re-evaluates
    against the live synopsis stream at every close cycle of a streaming
    CM job (queries pre-dating the first synopsis buffer, then flush —
    QueryLatestFunction.java:42-60).  On bounded input the final cycle's
    answers equal batch queryLatest, so this row SHARES query_latest_cm's
    SQL oracle; the per-cycle evolution is covered by pytest."""
    import tempfile

    from ..engine.streaming import StreamingSynopsisJob
    from ..evaluate.continuous import ContinuousQueryLatest
    from ..evaluate.queries import query_count_min

    tool_frags = _tool_stream_fragments(sf_dir)

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
        parallelism=2,
    )
    out_dir = tempfile.mkdtemp(prefix="condor_contq_")
    job = StreamingSynopsisJob(cfg, out_dir, columns=["conv_id", "tool", "ts"])
    standing = pd.DataFrame(
        {
            "query_key": java_string_hash_array(TOOL_UNIVERSE).astype(np.int64),
            "tool": TOOL_UNIVERSE,
        }
    )
    ev = ContinuousQueryLatest(job, query_count_min)
    res = ev.run(tool_frags, lambda k: standing)
    job.shutdown()
    # when the first synopsis only appears at the end-of-stream flush, the
    # final cycle carries buffered-query flushes PLUS the final arrival —
    # identical answers (first == latest), so dedup to one row per query
    final = res[res["cycle"] == res["cycle"].max()].drop_duplicates()
    return pd.DataFrame(
        {
            "tool": final["tool"].to_numpy(object),
            "window_start": final["window_start"].astype(np.int64).to_numpy(),
            "est": final["result"].astype(np.int64).to_numpy(),
        }
    ).reset_index(drop=True)


def streaming_cm_asof(sf_dir: str, window: TumblingWindow):
    """CONTINUOUS queryTimestamped: every tool turn queries its own tool's
    frequency at its own event time against the live streaming job's
    synopsis ARCHIVE (bounded TreeSet, floor routing + in-window check —
    QueryTimestampedFunction.java:31-97).

    Arrival plan: queries whose ts falls in the FIRST window arrive at
    cycle 0 (pre-first-synopsis => they exercise the buffer-then-flush
    path, :64-66/:91-95); the rest arrive at the end-of-stream cycle when
    every window is closed and archived.  With an unbounded archive the
    union of answers equals batch queryTimestamped, so this row SHARES
    cm_asof_queries' SQL oracle; eviction/drop quirks are pytest-covered."""
    import tempfile

    import pyarrow.parquet as pq

    from ..engine.streaming import StreamingSynopsisJob
    from ..evaluate.continuous import ContinuousQueryTimestamped
    from ..evaluate.queries import query_count_min

    tool_frags = _tool_stream_fragments(sf_dir)

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("tool", "java_hash"),
        parallelism=2,
    )
    out_dir = tempfile.mkdtemp(prefix="condor_contts_")
    job = StreamingSynopsisJob(cfg, out_dir, columns=["conv_id", "tool", "ts"])

    t = pa.concat_tables(
        pq.read_table(f, columns=["tool", "ts"]) for f in tool_frags
    )
    ts_us = ts_to_us(t["ts"])
    tools = t["tool"].to_pandas().to_numpy(object)
    q = pd.DataFrame(
        {
            "query_key": java_string_hash_array(tools).astype(np.int64),
            "query_ts": ts_us.astype(np.int64),
            "tool": tools,
        }
    )
    w_us = window.size_us
    first_end = (int(q["query_ts"].min()) // w_us) * w_us + w_us
    arrivals = {
        0: q[q["query_ts"] < first_end],
        len(tool_frags): q[q["query_ts"] >= first_end],
    }
    ev = ContinuousQueryTimestamped(job, query_count_min)
    res = ev.run(tool_frags, arrivals)
    job.shutdown()
    return pd.DataFrame(
        {
            "tool": res["tool"].to_numpy(object),
            "query_ts": res["query_ts"].astype(np.int64).to_numpy(),
            "window_start": res["window_start"].astype(np.int64).to_numpy(),
            "est": res["result"].astype(np.int64).to_numpy(),
        }
    ).reset_index(drop=True)


def streaming_query_latest_stratified(sf_dir: str, window: TumblingWindow):
    """CONTINUOUS stratified queryLatest over a STRATIFIED streaming job:
    the (role x turn-probe) standing query set re-evaluates per close cycle
    against each role-stratum's latest synopsis (per-stratum broadcast
    state + per-stratum buffer flush, QueryLatestStratifiedFunction.java:
    28-88).  On bounded input the final cycle's answers equal batch
    queryLatestStratified, sharing its SQL oracle — this is also the
    driver row that exercises the streaming engine's stratified path."""
    import tempfile

    from ..engine.streaming import StreamingSynopsisJob
    from ..evaluate.continuous import ContinuousQueryLatestStratified
    from ..evaluate.queries import query_count_min
    from .core import cached_event_stream_fragments

    frags = cached_event_stream_fragments(sf_dir)
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
        parallelism=2,
    )
    out_dir = tempfile.mkdtemp(prefix="condor_contstrat_")
    job = StreamingSynopsisJob(
        cfg, out_dir, columns=["conv_id", "role", "turn_idx", "ts"]
    )
    roles = ["user", "assistant", "tool"]
    standing = pd.DataFrame(
        {
            "query_key": np.array(
                [p for _ in roles for p in STRAT_TURN_PROBES], dtype=np.int64
            ),
            "stratum": [r for r in roles for _ in STRAT_TURN_PROBES],
        }
    )
    ev = ContinuousQueryLatestStratified(job, query_count_min)
    res = ev.run(frags, lambda k: standing)
    job.shutdown()
    # a stratum whose first synopsis arrives only at the final flush gets
    # its buffered frames AND the final arrival in the same cycle — the
    # answers are identical (first == latest for that stratum), dedup
    final = res[res["cycle"] == res["cycle"].max()].drop_duplicates()
    return pd.DataFrame(
        {
            "stratum": final["stratum"].to_numpy(object),
            "turn_probe": final["query_key"].astype(np.int64).to_numpy(),
            "window_start": final["window_start"].astype(np.int64).to_numpy(),
            "est": final["result"].astype(np.int64).to_numpy(),
        }
    ).reset_index(drop=True)


def streaming_cm_asof_stratified(sf_dir: str, window: TumblingWindow):
    """CONTINUOUS stratified queryTimestamped: every turn (turn_idx < 20)
    queries its own (role, turn_idx) frequency at its own event time
    against its role-stratum's bounded synopsis archive in the live
    streaming job (QueryStratifiedTimestampedFunction.java:30-96).

    All queries arrive at the end-of-stream cycle (every window closed,
    archive unbounded), so the answers equal batch
    queryTimestampedStratified and this row SHARES cm_asof_stratified's
    SQL oracle; buffer/eviction quirks are pytest-covered on the
    unstratified archive (same code shape)."""
    import tempfile

    import pyarrow.parquet as pq

    from ..engine.streaming import StreamingSynopsisJob
    from ..evaluate.continuous import ContinuousQueryTimestampedStratified
    from ..evaluate.queries import query_count_min
    from .core import cached_event_stream_fragments

    frags = cached_event_stream_fragments(sf_dir)
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
        parallelism=2,
    )
    out_dir = tempfile.mkdtemp(prefix="condor_contstratts_")
    job = StreamingSynopsisJob(
        cfg, out_dir, columns=["conv_id", "role", "turn_idx", "ts"]
    )

    t = pa.concat_tables(
        pq.read_table(f, columns=["role", "turn_idx", "ts"]) for f in frags
    )
    t = t.filter(pc.less(t["turn_idx"], 20))
    q = pd.DataFrame(
        {
            "query_key": t["turn_idx"].to_numpy().astype(np.int64),
            "query_ts": ts_to_us(t["ts"]).astype(np.int64),
            "stratum": t["role"].to_pandas().to_numpy(object),
        }
    )
    arrivals = {len(frags): q}
    ev = ContinuousQueryTimestampedStratified(job, query_count_min)
    res = ev.run(frags, arrivals)
    job.shutdown()
    return pd.DataFrame(
        {
            "stratum": res["stratum"].to_numpy(object),
            "turn_probe": res["query_key"].astype(np.int64).to_numpy(),
            "query_ts": res["query_ts"].astype(np.int64).to_numpy(),
            "window_start": res["window_start"].astype(np.int64).to_numpy(),
            "est": res["result"].astype(np.int64).to_numpy(),
        }
    ).reset_index(drop=True)


def query_latest_sql(cte: str, w_us: int) -> str:
    return f"""{cte},
counts AS (
  SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start, tool,
         count(*) AS c
  FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2
),
latest AS (SELECT max(window_start) AS ws FROM counts)
SELECT u.probe AS tool, l.ws AS window_start,
       CAST(coalesce(c.c, 0) AS BIGINT) AS est
FROM latest l
CROSS JOIN {_universe_sql(False)}
LEFT JOIN counts c ON c.window_start = l.ws AND c.tool = u.probe"""


# -- 10. HyperLogLog distinct-count contract --------------------------------

HLL_REL_TOL = 0.10


def hll_distinct_check(ds, window: TumblingWindow):
    """Per-window HLL{16,7} distinct-conversation estimate vs the EXACT
    distinct count (oracle: COUNT(DISTINCT conv_id)), with ``within_bound``
    asserting the estimate lands near the QUIRK-AWARE expectation: the
    reference's combined 64-bit hash always has bit 63 == 0
    (HyperLogLogSketch.java:58-63), so only half the register space is
    addressable and the estimator stays in the linear-counting regime with
    m/2 effective registers — expected = m*ln(m/(m-occ)),
    occ = (m/2)*(1-exp(-n/(m/2))).  A kernel that broke hashing, register
    updates, partial merging or the estimator lands outside the band."""
    import math

    from .core import windowed_distinct_convs

    m = 1 << 16
    cfg = BuildConfiguration(
        synopsis="HyperLogLogSketch",
        params=(16, 7),
        windows=[window],
        key=KeySpec("conv_id", "java_hash"),
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2).to_pandas()
    ests = {
        int(r["window_start"]): Synopsis.from_bytes(r["payload"]).distinct_items_estimator()
        for _, r in syn.iterrows()
    }
    exact = windowed_distinct_convs(ds, window).to_pandas()

    rows = []
    for _, r in exact.iterrows():
        ws, n = int(r["window_start"]), int(r["n_convs"])
        est = ests.get(ws, 0)
        # occ < m/2 by construction, so m - occ is always positive
        occ = (m / 2.0) * (1.0 - math.exp(-n / (m / 2.0)))
        expected = m * math.log(m / (m - occ))
        ok = abs(est - expected) <= HLL_REL_TOL * expected + 3.0
        rows.append((ws, n, bool(ok)))
    out = pd.DataFrame(rows, columns=["window_start", "n_convs", "within_bound"])
    return out.astype(
        {"window_start": np.int64, "n_convs": np.int64, "within_bound": bool}
    )


def hll_sql(cte: str, w_us: int) -> str:
    return f"""{cte}
SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start,
       count(DISTINCT conv_id) AS n_convs,
       true AS within_bound
FROM transcripts GROUP BY 1"""


# -- 11. Stratified queryLatest ---------------------------------------------

STRAT_TURN_PROBES = list(range(20))


def query_latest_stratified_cm(ds, window: TumblingWindow):
    """Stratified queryLatest (ApproximateDataAnalytics.queryLatestStratified):
    CM per (window, role stratum) keyed by turn_idx; every (role, probe
    turn_idx) pair queries its stratum's LATEST window.  Collision-free in
    practice (20 probe keys vs width 65536, min over 5 rows), so estimates
    equal the SQL GROUP BY counts."""
    import ray.data as rd

    from ..evaluate.queries import query_count_min, query_latest_stratified

    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[window],
        key=KeySpec("turn_idx", "value"),
        stratify_by="role",
    )
    syn = build_windowed_synopses(ds, cfg, concurrency=2)
    roles = ["user", "assistant", "tool"]
    queries = rd.from_items(
        [
            {"query_key": int(k), "stratum": r}
            for r in roles
            for k in STRAT_TURN_PROBES
        ]
    )
    out = query_latest_stratified(queries, syn, query_count_min).to_pandas()
    return pd.DataFrame(
        {
            "stratum": out["stratum"].to_numpy(object),
            "turn_probe": out["query_key"].astype(np.int64),
            "window_start": out["window_start"].astype(np.int64),
            "est": out["result"].astype(np.int64),
        }
    )


def query_latest_stratified_sql(cte: str, w_us: int) -> str:
    probes = ", ".join(str(p) for p in STRAT_TURN_PROBES)
    return f"""{cte},
counts AS (
  SELECT (epoch_us(ts) // {w_us}) * {w_us} AS window_start, role,
         CAST(turn_idx AS BIGINT) AS turn_probe, count(*) AS c
  FROM transcripts GROUP BY 1, 2, 3
),
latest AS (SELECT role, max(window_start) AS ws FROM counts GROUP BY 1),
probes AS (SELECT unnest([{probes}]) AS turn_probe)
SELECT l.role AS stratum, CAST(p.turn_probe AS BIGINT) AS turn_probe,
       l.ws AS window_start,
       CAST(coalesce(c.c, 0) AS BIGINT) AS est
FROM latest l
CROSS JOIN probes p
LEFT JOIN counts c
  ON c.window_start = l.ws AND c.role = l.role AND c.turn_probe = p.turn_probe"""
