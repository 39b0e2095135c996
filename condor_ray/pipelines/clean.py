"""End-to-end corpus cleaning: the composed training-data-prep flagship.

``clean_corpus`` chains the engine's quality-filter family into one
streaming plan — the pipeline a real pretraining-data user runs:

1. C4 boilerplate line filter (``textstats.c4_line_filter``) — drop
   short / punctuation-less / boilerplate lines, keep the rest.
2. PII redaction (``textstats.redact_pii``) — emails / IPs / phones
   become placeholder tokens.
3. ONE fused gate pass — quality score, Gopher repetition fractions and
   eval-set contamination are computed per batch by the SAME kernels the
   standalone operators use (``_quality_kernel``, ``_repetition_kernel``,
   ``_contam_counts`` — no reimplementation, no drift) and failing docs
   drop.  Fusing the three gates avoids re-tokenizing the corpus three
   times and, more importantly at scale, avoids any doc_id join: the text
   column never leaves the stage between checks.
4. Exact dedup keeping text (``dedup.exact_dedup_keep_text``) — the only
   shuffle in the plan, carrying each surviving text exactly once.

Every stage is a streaming ``map_batches`` (the dedup conquer is a
bounded-partition groupby), so the plan executes with backpressure end to
end — nothing materializes between stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def clean_corpus(
    docs_ds,
    benchmark=None,
    *,
    ngram: int = 13,
    line_min_words: int = 3,
    min_quality: float = 0.25,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    min_words: int = 5,
    dedup: bool = True,
    n_parts: int | None = None,
):
    """Clean ``(doc_id, text)`` docs for training; returns the surviving
    ``(doc_id, text)`` Dataset (text line-filtered and PII-redacted).

    ``benchmark``: optional eval set (Dataset / DataFrame / sequence of
    strings) — docs sharing any word ``ngram``-gram with it drop.  Gates:
    ``quality >= min_quality`` and ``n_words >= min_words``
    (``_quality_kernel``), ``dup_line_frac <= max_dup_line_frac`` and
    ``top_bigram_frac <= max_top_bigram_frac`` (``_repetition_kernel``).
    ``dedup=False`` skips the final exact dedup (and with it the plan's
    only shuffle)."""
    import ray

    from ..runtime import worker_polars
    from .dedup import (
        _contam_counts,
        benchmark_ngram_hashes,
        exact_dedup_keep_text,
    )
    from .textstats import _quality_kernel, _repetition_kernel, c4_line_filter, redact_pii

    ds = c4_line_filter(docs_ds, min_words=line_min_words).select_columns(
        ["doc_id", "text"]
    )
    ds = redact_pii(ds).select_columns(["doc_id", "text"])

    if benchmark is not None:
        pl = worker_polars()

        if hasattr(benchmark, "to_arrow_refs"):  # a (small) ray Dataset
            tables = [
                t
                for t in ray.get(
                    benchmark.select_columns(["text"]).to_arrow_refs()
                )
                if t.num_rows
            ]
            texts = pl.from_arrow(
                pa.concat_tables(tables)["text"].combine_chunks()
                if tables
                else pa.array([], type=pa.string())
            )
        else:
            import pandas as pd

            texts = (
                pl.from_pandas(benchmark["text"])
                if isinstance(benchmark, pd.DataFrame)
                else benchmark
            )
        bench_ref = ray.put(benchmark_ngram_hashes(texts, ngram))
    else:
        bench_ref = None

    out_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.schema.names:
            return out_schema.empty_table()
        pl = worker_polars()

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pl.from_arrow(text).fill_null("")
        q = _quality_kernel(pl, s)
        r = _repetition_kernel(pl, s)
        keep = (
            (q["quality"] >= min_quality)
            & (q["n_words"] >= min_words)
            & (r["dup_line_frac"] <= max_dup_line_frac)
            & (r["top_bigram_frac"] <= max_top_bigram_frac)
        )
        if bench_ref is not None:
            counts, _tot = _contam_counts(s, ray.get(bench_ref), ngram)
            keep &= counts == 0
        return batch.filter(pa.array(keep)).cast(out_schema)

    ds = ds.map_batches(gate, batch_format="pyarrow")
    if dedup:
        ds = exact_dedup_keep_text(ds, n_parts)
    return ds


def clean_corpus_sql(
    docs_table: str = "documents",
    bench_where: str = "doc_id % 101 = 7",
    *,
    bench_table: str | None = None,
    ngram: int = 13,
    line_min_words: int = 3,
    min_quality: float = 0.25,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    min_words: int = 5,
) -> str:
    """DuckDB twin of :func:`clean_corpus` with the benchmark side a
    predicate-selected slice of the RAW ``bench_table`` (default: the
    corpus table itself — gate-row shape).

    Chains the component twins in the operator's order — C4 line filter
    → PII redaction → (quality / repetition / decontamination) gate →
    min-doc_id-per-text dedup.  Every gate expression is the component
    twin's bit-identical double, so threshold comparisons agree exactly;
    the decontamination membership is string-gram equality (equal to the
    kernel's hash membership up to ~1/2^64 collisions)."""
    from .dedup import decontaminate_sql
    from .textstats import (
        c4_line_filter_sql,
        quality_sql,
        redact_pii_sql,
        repetition_sql,
    )

    return f"""
WITH cc_c4 AS ({c4_line_filter_sql(docs_table, line_min_words)}),
cc_pii AS (SELECT doc_id, text FROM ({redact_pii_sql('cc_c4')})),
cc_q AS (SELECT doc_id, n_words, quality FROM ({quality_sql('cc_pii')})),
cc_rep AS (SELECT * FROM ({repetition_sql('cc_pii')})),
cc_dc AS (SELECT doc_id, contaminated
          FROM ({decontaminate_sql('cc_pii', bench_where, ngram,
                                   bench_table=bench_table or docs_table)})),
cc_keep AS (
  SELECT p.doc_id, p.text
  FROM cc_pii p
  JOIN cc_q q USING (doc_id)
  JOIN cc_rep r USING (doc_id)
  JOIN cc_dc d USING (doc_id)
  WHERE q.quality >= {min_quality} AND q.n_words >= {min_words}
    AND r.dup_line_frac <= {max_dup_line_frac}
    AND r.top_bigram_frac <= {max_top_bigram_frac}
    AND NOT d.contaminated
)
SELECT min(doc_id) AS doc_id, text FROM cc_keep GROUP BY text"""
