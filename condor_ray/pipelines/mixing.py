"""Deterministic stratified sampling for training-data mixing.

A pretraining mix is specified as per-stratum keep fractions (by language,
source, quality bucket, …).  At 100 TB the sample must be DETERMINISTIC —
a function of the row key alone — so a re-run, a resumed run, and every
partition of a distributed run all make the same keep decision without
coordination or a stored sample: ``keep = splitmix64(key ^ seed) / 2^64 <
fraction[stratum]``.

One streaming ``map_batches`` pass, no shuffle, no RNG state.  The hash is
splitmix64 (public-domain mixer, Steele et al. "Fast Splittable
Pseudorandom Number Generators", OOPSLA'14) implemented identically in
numpy uint64 arithmetic and in the DuckDB twin's HUGEINT-mod-2^64
arithmetic, so ``sample_stratified_sql`` is bit-identical — the same rows
survive on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64/int64 array."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z ^= z >> np.uint64(31)
    return z


def sample_stratified(
    ds,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
):
    """Keep each row with probability ``fractions[stratum]``, decided by
    ``splitmix64(key ^ seed)`` alone — deterministic, coordination-free,
    re-run-stable.  Strata not in ``fractions`` keep ``default_fraction``
    (0.0 = drop unlisted strata).  Returns the surviving rows with their
    original columns.

    The keep rule is ``hash < fraction * 2^64`` on the integer lattice
    (thresholds precomputed per stratum), so the SQL twin compares the
    exact same integers — no float rounding at the boundary."""
    items = sorted(fractions.items())
    strata = np.array([s for s, _ in items], dtype=object)
    # threshold on the uint64 lattice; fraction >= 1.0 keeps everything
    thresholds = np.array(
        [
            np.uint64(0xFFFFFFFFFFFFFFFF)
            if f >= 1.0
            else np.uint64(int(f * 2.0**64))
            for _, f in items
        ],
        dtype=np.uint64,
    )
    default_thr = (
        np.uint64(0xFFFFFFFFFFFFFFFF)
        if default_fraction >= 1.0
        else np.uint64(int(default_fraction * 2.0**64))
    )
    seed_u = np.uint64(np.int64(seed))

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_col not in batch.schema.names:
            return batch
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(key.view(np.uint64) ^ seed_u)
        s_col = batch[stratum_col]
        if isinstance(s_col, pa.ChunkedArray):
            s_col = s_col.combine_chunks()
        if len(strata):
            # NULL strata take the default fraction (the SQL twin's CASE
            # falls to ELSE on NULL); mask them out before the object-dtype
            # searchsorted, which cannot compare None with str
            null_mask = np.asarray(s_col.is_null())
            s = np.asarray(s_col.to_pandas(), dtype=object)
            s_cmp = np.where(null_mask, strata[0], s)
            idx = np.searchsorted(strata, s_cmp)
            idx_c = np.minimum(idx, len(strata) - 1)
            known = (idx < len(strata)) & (strata[idx_c] == s_cmp) & ~null_mask
            thr = np.where(known, thresholds[idx_c], default_thr)
        else:
            thr = default_thr
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(stage, batch_format="pyarrow")


def pack_sequences(
    ds,
    budget_tokens: int,
    n_parts: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Greedy first-fit sequence packing: assign docs to fixed token-budget
    bins (the standard pretraining sample-packing step).

    DETERMINISTIC AND PARTITION-INVARIANT: docs shard by ``id % n_parts``
    through the task hash exchange, each bucket sorts by id and packs
    greedily in id order — the output is a pure function of (corpus,
    budget, n_parts), independent of how the input Dataset was blocked
    (tested).  A doc longer than the budget gets a bin of its own.

    Token counts are whitespace-word counts (the ``token_stats`` rule); a
    real tokenizer slots into the same stage.  The per-bucket packer loops
    over BINS, not rows: each step closes the largest cumsum prefix that
    fits via ``searchsorted`` — O(bins log rows), vectorized row work.

    Returns ``(id_col, bin_id, bin_pos, n_tokens)``; ``bin_id`` is globally
    unique (``bucket << 40 | local``), ``bin_pos`` is the doc's position
    inside its bin.
    """
    import pyarrow.compute as pc

    from ..engine.exchange import hash_exchange, split_by_partition
    from ..runtime import default_n_parts

    n_parts = n_parts or default_n_parts()
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")

    pair_schema = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64())])
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("bin_id", pa.int64()),
            ("bin_pos", pa.int32()),
            ("n_tokens", pa.int64()),
        ]
    )

    def shard(block, n_buckets: int):
        # project to (id, token count) BEFORE the wire — text never shuffles
        if not isinstance(block, pa.Table):  # pandas-backed block
            import pandas as pd

            block = pa.Table.from_pandas(block, preserve_index=False) if isinstance(
                block, pd.DataFrame
            ) else pa.table(block)
        if block.num_rows == 0 or id_col not in block.schema.names:
            return tuple(pair_schema.empty_table() for _ in range(n_buckets))
        text = block[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = (
            pc.count_substring_regex(
                pc.coalesce(text.cast(pa.string()), ""), r"[^\t\n\f\r ]+"
            )
            .cast(pa.int64())
            .to_numpy()
        )
        doc = block[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({id_col: pa.array(doc), "n_tokens": pa.array(n_tok)})
        return split_by_partition(t, doc % n_buckets, n_buckets)

    def pack(*tables):
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return out_schema.empty_table()
        cat = pa.concat_tables(tables)
        doc = cat[id_col].to_numpy()
        tok = cat["n_tokens"].to_numpy()
        order = np.argsort(doc, kind="stable")
        doc, tok = doc[order], tok[order]
        bucket = int(doc[0] % n_parts) if len(doc) else 0
        csum = np.cumsum(tok)
        bin_id = np.empty(len(doc), dtype=np.int64)
        bin_pos = np.empty(len(doc), dtype=np.int32)
        start, b = 0, 0
        while start < len(doc):
            base = csum[start - 1] if start else 0
            end = int(np.searchsorted(csum, base + budget_tokens, side="right"))
            end = max(end, start + 1)  # oversized doc: its own bin
            bin_id[start:end] = (bucket << 40) | b
            bin_pos[start:end] = np.arange(end - start, dtype=np.int32)
            start, b = end, b + 1
        return pa.table(
            {
                id_col: pa.array(doc),
                "bin_id": pa.array(bin_id),
                "bin_pos": pa.array(bin_pos),
                "n_tokens": pa.array(tok),
            }
        )

    return hash_exchange(ds, n_parts, shard, pack)


def sample_stratified_sql(
    docs_table: str,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB twin of :func:`sample_stratified` — splitmix64 in HUGEINT
    arithmetic mod 2^64, the same integer thresholds, bit-identical keeps."""
    two64 = 1 << 64

    def thr(f: float) -> int:
        return 0xFFFFFFFFFFFFFFFF if f >= 1.0 else int(f * 2.0**64)

    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN CAST({thr(f)} AS HUGEINT)"
        for s, f in sorted(fractions.items())
    )
    seed_u = np.uint64(np.int64(seed))
    two32 = 1 << 32

    def mulmod(x: str, const: int) -> str:
        # (x * const) mod 2^64 without overflowing INT128: split both
        # factors into 32-bit halves — every partial product fits
        bl, bh = const & 0xFFFFFFFF, const >> 32
        return (
            f"(({x} % {two32}) * {bl} + "
            f"((({x} % {two32}) * {bh} + ({x} // {two32}) * {bl}) % {two32})"
            f" * {two32}) % {two64}"
        )

    # splitmix64 in mod-2^64 HUGEINT arithmetic; >> k == // 2^k for the
    # non-negative residues mod 2^64, xor() takes the HUGEINT pair
    return f"""
WITH sm AS (
  SELECT *,
         (CASE WHEN {key_col} < 0
               THEN CAST({key_col} AS HUGEINT) + {two64}
               ELSE CAST({key_col} AS HUGEINT) END) AS k0
  FROM {docs_table}
), s1 AS (
  SELECT *, (xor(k0, {int(seed_u)}) + {int(_SM_GAMMA)}) % {two64} AS z1 FROM sm
), s2 AS (
  SELECT *, {mulmod(f"xor(z1, z1 // {1 << 30})", int(_SM_M1))} AS z2 FROM s1
), s3 AS (
  SELECT *, {mulmod(f"xor(z2, z2 // {1 << 27})", int(_SM_M2))} AS z3 FROM s2
), hashed AS (
  SELECT *, xor(z3, z3 // {1 << 31}) AS h FROM s3
)
SELECT * EXCLUDE (k0, z1, z2, z3, h)
FROM hashed
WHERE h < (CASE {cases} ELSE CAST({thr(default_fraction)} AS HUGEINT) END)"""
