#!/usr/bin/env python
"""sf1 soak: the headline streaming pipelines at 600M rows (10x the bench
scale, 100x the driver gate), with state high-water marks recorded to
evidence bounded state.

The fixture is THIN (conv_id, role, ts only): the headline jobs prune their
reads to those columns anyway, so the compute path is identical while the
fixture stays ~3 GB instead of ~220 GB.  Writes BENCH_soak_sf1.json.

Usage: PYTHONPATH=/root/repo python tools/soak_sf1.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import ray


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from condor_ray.config import BuildConfiguration, KeySpec
    from condor_ray.engine.batch import windowed_counts
    from condor_ray.engine.streaming import StreamingSynopsisJob
    from condor_ray.sources.transcripts import (
        generate_stream_fixture,
        read_transcripts,
        transcript_fragments,
    )
    from condor_ray.windows import SlidingWindow, TumblingWindow

    t0 = time.perf_counter()
    fixture = generate_stream_fixture(
        n_rows=n_rows,
        n_convs=max(n_rows // 1000, 600),
        seed=42,
        n_fragments=512,
        columns=("conv_id", "turn_idx", "role", "ts"),
    )
    frags = transcript_fragments(fixture)
    gen_sec = time.perf_counter() - t0
    total_rows = sum(
        __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(f).num_rows
        for f in frags
    )
    fixture_gb = sum(os.path.getsize(f) for f in frags) / 2**30
    print(f"fixture: {total_rows} rows, {fixture_gb:.1f} GiB, gen {gen_sec:.0f}s",
          flush=True)

    results: dict = {
        "rows": total_rows,
        "num_cpus": ncpu,
        "fixture_gib": round(fixture_gb, 2),
        "jobs": {},
    }

    def manifest_hwm(out_dir: str) -> int:
        last = None
        with open(os.path.join(out_dir, "manifest.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("summary"):
                    last = rec
        if not last or "partitions" not in last:
            return -1
        return max(p.get("max_open_slices", -1) for p in last["partitions"])

    # 1) headline: streaming CM{65536,5,7} tumbling 60 s
    p = max(2, min(16, ncpu // 2))
    out = tempfile.mkdtemp(prefix="soak_cm_")
    cfg = BuildConfiguration(
        synopsis="CountMinSketch",
        params=(65536, 5, 7),
        windows=[TumblingWindow(60_000)],
        key=KeySpec("conv_id", "java_hash"),
        parallelism=p,
    )
    job = StreamingSynopsisJob(cfg, out, columns=["conv_id", "ts"])
    t0 = time.perf_counter()
    job.run(frags)
    wall = time.perf_counter() - t0
    job.shutdown()
    results["jobs"]["stream_cm_tumbling_60s"] = {
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall),
        "max_open_slices": manifest_hwm(out),
    }
    print("cm:", results["jobs"]["stream_cm_tumbling_60s"], flush=True)

    # 2) streaming HLL sliding 60s/30s (invertible close path) at full scale
    out = tempfile.mkdtemp(prefix="soak_hll_")
    cfg = BuildConfiguration(
        synopsis="HyperLogLogSketch",
        params=(16, 7),
        windows=[SlidingWindow(60_000, 30_000)],
        key=KeySpec("conv_id", "java_hash"),
        parallelism=p,
    )
    job = StreamingSynopsisJob(cfg, out, columns=["conv_id", "ts"])
    t0 = time.perf_counter()
    job.run(frags)
    wall = time.perf_counter() - t0
    job.shutdown()
    results["jobs"]["stream_hll_sliding_60s_30s"] = {
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall),
        "max_open_slices": manifest_hwm(out),
    }
    print("hll:", results["jobs"]["stream_hll_sliding_60s_30s"], flush=True)

    # 3) streaming CEP: 3-step role pattern at full scale — bounded-state
    # evidence for the newest stateful operator (peak pending rows must stay
    # at the watermark-lag bound, not grow with the 600M-row stream)
    from condor_ray.engine.streaming_cep import StreamingPatternJob
    from condor_ray.pipelines.cep import Step

    out = tempfile.mkdtemp(prefix="soak_cep_")
    cep = StreamingPatternJob(
        [
            Step("role", "eq", "user"),
            Step("role", "eq", "assistant"),
            Step("role", "eq", "tool"),
        ],
        out,
        within_ms=60_000,
        parallelism=p,
    )
    t0 = time.perf_counter()
    st = cep.run(frags)
    wall = time.perf_counter() - t0
    cep.shutdown()

    def summary_field(out_dir: str, field: str) -> int:
        last = -1
        with open(os.path.join(out_dir, "manifest.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("summary") and field in rec:
                    last = rec[field]
        return last

    results["jobs"]["stream_cep_3step"] = {
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall),
        "matches": st["matches_emitted"],
        "peak_pending_rows": summary_field(out, "peak_pending_rows"),
    }
    print("cep:", results["jobs"]["stream_cep_3step"], flush=True)

    # 4) exact stratified windowed counts (pure Ray Data groupby path)
    ds = read_transcripts(fixture, columns=["role", "ts"])
    t0 = time.perf_counter()
    windowed_counts(ds, TumblingWindow(60_000), stratify_by="role").materialize()
    wall = time.perf_counter() - t0
    results["jobs"]["windowed_counts_by_role"] = {
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall),
    }
    print("counts:", results["jobs"]["windowed_counts_by_role"], flush=True)

    # 5) windowed Haar wavelets (order-based path, round-4 task-based
    # window-partition exchange) at full 600M-row scale
    from condor_ray.engine.ordered import build_windowed_wavelets_from_fragments

    t0 = time.perf_counter()
    build_windowed_wavelets_from_fragments(
        frags, TumblingWindow(60_000), size=1024, parallelism=4,
        key=KeySpec("turn_idx", "value"), columns=["conv_id", "turn_idx", "ts"],
    ).materialize()
    wall = time.perf_counter() - t0
    results["jobs"]["wavelet_windows_60s"] = {
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_rows / wall),
    }
    print("wavelets:", results["jobs"]["wavelet_windows_60s"], flush=True)

    # 6) connected components on a 50M-edge giant component (round-4
    # edge-resident actors: edges shuffle once at load, label deltas only
    # per round)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from condor_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(42)
    nv, ne = 20_000_000, 50_000_000
    # chain contributes nv-1 links, random part tops up to exactly ne edges
    a = rng.integers(0, nv, ne - (nv - 1), dtype=np.int64)
    b = rng.integers(0, nv, ne - (nv - 1), dtype=np.int64)
    chain = np.arange(nv, dtype=np.int64)
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": np.concatenate([a, chain[:-1]]),
                "doc_b": np.concatenate([b, chain[1:]]),
            }
        )
    ).repartition(256).materialize()
    t0 = time.perf_counter()
    comps = connected_components(pairs, n_parts=32)
    n_comp_rows = comps.count()
    wall = time.perf_counter() - t0
    results["jobs"]["connected_components_50m_edges"] = {
        "wall_s": round(wall, 2),
        "edges": ne,
        "vertices": n_comp_rows,
        "edges_per_s": round(ne / wall),
    }
    print("components:", results["jobs"]["connected_components_50m_edges"],
          flush=True)

    # 7) generic as-of join at 600M rows: every tool turn attaches its
    # conversation's latest user turn (task-exchange + per-bucket
    # merge_asof; the thin fixture has no `tool` column, so probes select
    # on role — identical plan shape)
    import pyarrow.compute as pc

    from condor_ray.pipelines.temporal_join import asof_join

    def _role_is(role):
        def f(b):
            if b.num_rows == 0 or "role" not in b.schema.names:
                return b
            return b.filter(pc.equal(b["role"], role))

        return f

    cols4 = ["conv_id", "turn_idx", "role", "ts"]
    t0 = time.perf_counter()
    out = asof_join(
        read_transcripts(fixture, columns=cols4).map_batches(
            _role_is("tool"), batch_format="pyarrow"
        ),
        read_transcripts(fixture, columns=cols4).map_batches(
            _role_is("user"), batch_format="pyarrow"
        ),
        left_cols={"turn_idx": "turn_idx"},
        right_cols={"user_ts": "ts", "user_turn": "turn_idx"},
        right_order=("user_turn",),
    ).materialize()
    wall = time.perf_counter() - t0
    from condor_ray.engine.exchange import LAST_EXCHANGE_STATS

    results["jobs"]["asof_tool_user_600m"] = {
        "wall_s": round(wall, 2),
        "probe_rows": out.count(),
        "input_rows_per_s": round(total_rows / wall),
        # the exchange's measured object-store footprint: peak folded bytes
        # resident (the projected two-sided stream), waves, shard tasks —
        # the manifest evidence for the wave-bounded exchange
        "exchange": dict(LAST_EXCHANGE_STATS),
    }
    print("asof:", results["jobs"]["asof_tool_user_600m"], flush=True)

    # 8) MinHash-LSH near-dup dedup at 2M docs (10x the bench corpus):
    # the sf0.1 documents table deterministically inflated to 2M docs with
    # the bench's planted-near-dup scheme (rep 1 keeps every 50th rep-0
    # text + a short tail), so the row reports docs/s AND planted-pair
    # recall at scale
    import polars as pl
    import pyarrow.parquet as _pq

    from condor_ray.pipelines.dedup import minhash_lsh_pairs

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    base = pl.from_arrow(docs)
    doc_step = int(base["doc_id"].max()) + 1
    n_reps = max(2, 2_000_000 // len(base))
    reps = []
    for r in range(n_reps):
        if r == 0:
            reps.append(base)
            continue
        src = base.filter(pl.col("doc_id") % 50 != 0) if r == 1 else base
        mutated = src.with_columns(
            (pl.col("doc_id") + r * doc_step).alias("doc_id"),
            pl.col("text").str.replace_all(r"(\S+)", "${1}_" + str(r)).alias("text"),
        )
        if r == 1:
            near = base.filter(pl.col("doc_id") % 50 == 0).with_columns(
                (pl.col("doc_id") + doc_step).alias("doc_id"),
                (pl.col("text") + " planted tail").alias("text"),
            )
            mutated = pl.concat([mutated, near])
        reps.append(mutated)
    corpus = (
        rd.from_arrow(pl.concat(reps).to_arrow()).repartition(2 * ncpu).materialize()
    )
    n_docs = corpus.count()
    planted = set(int(d) for d in base["doc_id"] if d % 50 == 0)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(corpus).to_pandas()
    wall = time.perf_counter() - t0
    lo = np.minimum(pairs["doc_a"], pairs["doc_b"])
    hi = np.maximum(pairs["doc_a"], pairs["doc_b"])
    found = set(
        int(a) for a, b in zip(lo, hi) if b - a == doc_step and a in planted
    )
    results["jobs"]["minhash_dedup_2m_docs"] = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "pairs": len(pairs),
        "docs_per_s": round(n_docs / wall),
        "planted_pairs": len(planted),
        "planted_recall": round(len(found) / max(1, len(planted)), 4),
    }
    print("minhash:", results["jobs"]["minhash_dedup_2m_docs"], flush=True)

    # 9) eval-set decontamination over the same 2M-doc corpus: 1k lifted
    # benchmark items (every base doc in the first 1k flags) + 1k novel;
    # the broadcast-membership shape's docs/s at 10x the bench corpus
    from condor_ray.pipelines.dedup import decontaminate

    bench_items = [
        " ".join((t or "").split()[:13])
        for t in base["text"].head(1000).to_list()
    ] + [f"unmatched soak filler sentence number {i} zzq" for i in range(1000)]
    t0 = time.perf_counter()
    n_contam = int(
        decontaminate(corpus, bench_items, n=13)
        .map_batches(
            lambda t: pa.table({"c": t["contaminated"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .sum("c")
    )
    wall = time.perf_counter() - t0
    results["jobs"]["decontam_2m_docs"] = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "flagged": n_contam,
        "docs_per_s": round(n_docs / wall),
    }
    print("decontam:", results["jobs"]["decontam_2m_docs"], flush=True)

    # 10) unigram word-rarity scoring over the same 2M-doc corpus: the
    # two-pass corpus-statistics shape at 10x the bench corpus.  The
    # bounded-state evidence is the DRIVER-SIDE table: O(vocabulary) u64
    # hash + count pairs (measured rows/bytes below), not O(corpus words).
    from condor_ray.pipelines.textstats import (
        corpus_word_counts,
        word_rarity_scores,
    )

    t0 = time.perf_counter()
    counts = corpus_word_counts(corpus)
    rar_rows = word_rarity_scores(corpus, counts=counts).count()
    wall = time.perf_counter() - t0
    assert rar_rows == n_docs
    results["jobs"]["word_rarity_2m_docs"] = {
        "wall_s": round(wall, 2),
        "docs": n_docs,
        "docs_per_s": round(n_docs / wall),
        "vocab_rows": int(len(counts[0])),
        "vocab_mb": round((counts[0].nbytes + counts[1].nbytes) / 1e6, 1),
    }
    print("word_rarity:", results["jobs"]["word_rarity_2m_docs"], flush=True)

    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_soak_sf1.json"), "w"
    ) as f:
        f.write(json.dumps(results) + "\n")
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
