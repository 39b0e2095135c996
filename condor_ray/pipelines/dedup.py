"""Deduplication pipelines over the ``documents`` table (SURVEY mandate:
exact, MinHash+LSH, SimHash, n-gram Jaccard verification).

Scale design notes (100 TB):
- exact dedup: content-hash inside ``map_batches`` (vectorized), then a
  bounded hash-partitioned vectorized group_by — the shuffle carries
  (hash, id) triples, never document bodies twice.
- MinHash-LSH: per-batch shingling + minhashing (fully vectorized), explode
  to (band, bucket, doc) rows, bounded-partition vectorized pair emission,
  exact signature-Jaccard verification filters false positives.  Only
  candidate pairs (tiny) leave the shuffle.
- SimHash: 64-bit fingerprints, banded into 4x16-bit chunks for bucketing;
  hamming-distance verification at pair time.
- Shared rule: NEVER one Ray group per LSH bucket or per pair — per-group
  dispatch costs ~0.5-1 ms; all grouping is hash-partitioned into O(cores)
  groups with CSR index math inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..runtime import default_n_parts, worker_polars


def with_planted_duplicates(ds, every: int = 7, offset: int = 10_000):
    """documents + deterministic copies: every ``every``-th doc_id reappears
    with doc_id + offset (exact duplicate) — SQL-replicable.

    ``offset`` must exceed every real doc_id: a planted id that collides
    with a real one silently corrupts keep-smallest-id semantics and the
    planted-duplicate oracle counts, so each batch checks and raises."""

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy() if not isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"].combine_chunks().to_numpy()
        if len(ids) and int(ids.max()) >= offset:
            raise ValueError(
                f"with_planted_duplicates: corpus doc_id {int(ids.max())} >= "
                f"offset {offset}; planted ids would collide with real ones — "
                "pass an offset larger than the maximum doc_id"
            )
        mask = pa.array(ids % every == 0)
        dups = batch.filter(mask)
        dups = dups.set_column(
            dups.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(dups["doc_id"], offset),
        )
        return pa.concat_tables([batch, dups])

    return ds.map_batches(dup, batch_format="pyarrow")


def content_hash_stage(n_parts: int):
    """Batch fn: (doc_id, text) -> (h1, h2, doc_id, part) — the engine's ONE
    128-bit content-hash + h1-partition stage (polars xxhash64, seeds 1/2).
    ``exact_dedup`` and the dup-components pipeline must shard identically;
    keep the hashing scheme here, never in per-site copies."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        pl = worker_polars()

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pl.from_arrow(text)
        h1 = s.hash(seed=1).to_numpy().view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(s.hash(seed=2).to_numpy().view(np.int64)),
                "doc_id": batch["doc_id"],
                "part": pa.array((h1 % n_parts).astype(np.int32)),
            }
        )

    return hash_stage


def exact_dedup(ds, n_parts: int | None = None):
    """Keep the smallest doc_id per distinct text.  Returns doc_id, n_copies.

    Content hashing is vectorized (polars xxhash64 with two independent seeds
    -> a 128-bit key, collision-safe at web scale); the shuffle carries only
    (h1, h2, doc_id) triples.  The conquer step hash-partitions on h1 into a
    BOUNDED number of groups and runs one vectorized polars group_by per
    partition — Ray's native sort-based aggregate costs ~50 us per distinct
    group, which dominates once distinct texts reach the millions."""
    n_parts = n_parts or default_n_parts()
    hash_stage = content_hash_stage(n_parts)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        pl = worker_polars()

        out = (
            pl.from_pandas(g[["h1", "h2", "doc_id"]])
            .group_by(["h1", "h2"])
            .agg(
                pl.col("doc_id").min().alias("doc_id"),
                pl.len().cast(pl.Int64).alias("n_copies"),
            )
            .sort("doc_id")
        )
        return out.select(["doc_id", "n_copies"]).to_pandas()

    return (
        ds.map_batches(hash_stage, batch_format="pyarrow")
        .groupby("part")
        .map_groups(agg, batch_format="pandas")
    )


def exact_dedup_keep_text(ds, n_parts: int | None = None):
    """Exact dedup that RETURNS the surviving rows ``(doc_id, text)`` —
    the corpus-producing sibling of :func:`exact_dedup` (which emits only
    the keep-list).  Same 128-bit content key and h1-partitioning as
    ``content_hash_stage`` (seeds 1/2 — keep them in sync); the shuffle
    carries each text exactly once, and each bounded partition keeps the
    min-doc_id row per key with one vectorized polars pass."""
    n_parts = n_parts or default_n_parts()

    def hash_stage(batch: pa.Table) -> pa.Table:
        pl = worker_polars()

        empty = pa.table(
            {
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.schema.names:
            return empty
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pl.from_arrow(text)
        h1 = s.hash(seed=1).to_numpy().view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(s.hash(seed=2).to_numpy().view(np.int64)),
                "doc_id": batch["doc_id"],
                "text": text,
                "part": pa.array((h1 % n_parts).astype(np.int32)),
            }
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        pl = worker_polars()

        return (
            pl.from_pandas(g[["h1", "h2", "doc_id", "text"]])
            .sort("doc_id")
            .unique(subset=["h1", "h2"], keep="first", maintain_order=True)
            .select(["doc_id", "text"])
            .to_pandas()
        )

    return (
        ds.map_batches(hash_stage, batch_format="pyarrow")
        .groupby("part")
        .map_groups(agg, batch_format="pandas")
    )


# -- MinHash + LSH ---------------------------------------------------------

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _add_pair_part(batch, n_parts: int):
    """Golden-ratio (doc_a, doc_b) pair partitioner shared by the dedup and
    jaccard-verify stages (was two verbatim copies)."""
    import pyarrow as pa

    a = batch["doc_a"].to_numpy().astype(np.uint64)
    b = batch["doc_b"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = ((a * _GOLDEN) ^ b) * _GOLDEN
    part = ((mixed >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("part", pa.array(part))


def _add_band_part(batch, n_parts: int, band_col: str = "band"):
    """Golden-ratio (band/table, bucket) partitioner shared by simhash_pairs
    and embedding_neardup_pairs (was two verbatim copies — a fix to the
    mixing applied to one silently desynchronized the other's balance).
    Mixes the band id into the partition key: raw bucket chunks (simhash's
    16-bit bands) collide across bands, unlike minhash's folded hash."""
    import pyarrow as pa

    bucket = batch["bucket"].to_numpy().astype(np.uint64)
    band = batch[band_col].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = (bucket ^ (band + np.uint64(1)) * _GOLDEN) * _GOLDEN
    part = ((mixed >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("part", pa.array(part))


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """Zero-copy-ish (n, num_perm) int64 matrix from a list<int64> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy().reshape(-1, num_perm)


def _pairs_within_groups(
    group_sizes_per_row: np.ndarray,
    local: np.ndarray,
    doc: np.ndarray,
    bucket_cap: int,
    window: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """All (i < j) index pairs within consecutive groups, fully vectorized.

    Rows must be grouped contiguously; ``local`` is each row's 0-based index
    within its group.  Groups larger than ``bucket_cap`` (degenerate
    boilerplate buckets) emit only pairs within ``window`` preceding rows —
    window=1 is a chain through the sorted group (same connected components
    as all-pairs in the RAW candidate graph, O(B) rows); a larger window
    trades rows for direct-pair recall among near neighbors in sort order.

    Recall caveat: the connectivity equivalence holds PRE-verification.
    ``minhash_lsh_pairs`` then filters every emitted pair by
    ``est_jaccard >= threshold``, and a chain link between two dissimilar
    sort-neighbors can be verified away, severing the only path between two
    genuinely similar docs that landed non-adjacent in a capped bucket.
    Capped buckets are by construction boilerplate floods where members
    co-occur in MANY buckets (other bands re-supply edges), so the loss is
    second-order — for clustering-critical corpora pass
    ``minhash_lsh_pairs(chain_keep_threshold=0.0)``, which keeps
    chain-provenance edges through the verification filter and restores
    the all-pairs connectivity guarantee (verify only the reported
    representative pairs afterwards), or raise ``window``.
    Returns (a_idx, b_idx) global row indices with a_idx < b_idx positions."""
    n = len(doc)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    preds = np.where(
        group_sizes_per_row > bucket_cap, np.minimum(local, window), local
    )
    m = int(preds.sum())
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos = np.arange(n, dtype=np.int64)
    b_idx = np.repeat(pos, preds)
    csum = np.concatenate(([0], np.cumsum(preds)))
    intra = np.arange(m, dtype=np.int64) - np.repeat(csum[:-1], preds)
    # row j pairs with the preds[j] rows immediately before it in its group
    # (all-pairs mode: preds == local => everything back to the group head)
    a_idx = np.repeat(pos - preds, preds) + intra
    return a_idx, b_idx


def _dedup_pairs(pairs_ds, n_parts: int | None = None, min_col: str | None = None,
                 or_col: str | None = None):
    """Distinct (doc_a, doc_b) rows (optionally keeping min of ``min_col``)
    without a per-group Ray aggregate.

    ``groupby(pair).aggregate(...)`` costs ~1 ms per distinct group in Ray's
    sort-based path — fatal when candidate pairs number in the millions.
    Instead: hash-partition pairs into a bounded number of groups and run
    one vectorized polars dedup per partition."""
    n_parts = n_parts or default_n_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        return _add_pair_part(batch, n_parts)

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        pl = worker_polars()

        pldf = pl.from_pandas(g.drop(columns=["part"]))
        aggs = []
        if min_col is not None:
            aggs.append(pl.col(min_col).min())
        if or_col is not None:
            # a pair is chain-provenanced if ANY band surfaced it through a
            # capped bucket (bool max == OR): the connectivity guarantee
            # must survive the pair ALSO colliding in some normal bucket —
            # with AND such a pair loses its chained flag and a
            # below-threshold chain link would still be dropped
            aggs.append(pl.col(or_col).max())
        if aggs:
            out = pldf.group_by(["doc_a", "doc_b"]).agg(aggs)
        else:
            out = pldf.unique(subset=["doc_a", "doc_b"])
        return out.sort(["doc_a", "doc_b"]).to_pandas()

    return (
        pairs_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(uniq, batch_format="pandas")
    )


def _bucket_pair_stage(key_cols: tuple[str, str], bucket_cap: int,
                       carry: tuple[str, ...] = (), id_col: str = "doc_id",
                       window: int = 1, tag_chained: bool = False):
    """Vectorized per-partition candidate-pair emitter.

    The caller hash-partitions banded rows into a BOUNDED number of
    partitions (``groupby('part')`` with P ~ O(cores), not one group per
    bucket — Ray's per-group pandas dispatch costs ~0.5 ms/group, fatal at
    millions of near-singleton LSH buckets).  This stage lexsorts one whole
    partition and emits every within-bucket pair with CSR index math; the
    only Python-level loop is over partitions."""

    c0, c1 = key_cols

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = {"doc_a": pd.Series(dtype=np.int64),
                   "doc_b": pd.Series(dtype=np.int64)}
            if tag_chained:
                out["chained"] = pd.Series(dtype=bool)
            for col in carry:
                out[f"{col}_a"] = g[col]
                out[f"{col}_b"] = g[col]
            return pd.DataFrame(out)
        a0 = g[c0].to_numpy()
        a1 = g[c1].to_numpy()
        doc = g[id_col].to_numpy()
        order = np.lexsort((doc, a1, a0))
        a0, a1, doc = a0[order], a1[order], doc[order]
        boundary = np.empty(len(doc), dtype=bool)
        boundary[0] = True
        boundary[1:] = (a0[1:] != a0[:-1]) | (a1[1:] != a1[:-1])
        gid = np.cumsum(boundary) - 1
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.concatenate((starts, [len(doc)])))
        local = np.arange(len(doc), dtype=np.int64) - starts[gid]
        a_idx, b_idx = _pairs_within_groups(
            sizes[gid], local, doc, bucket_cap, window=window
        )
        out = {
            "doc_a": doc[a_idx].astype(np.int64),
            "doc_b": doc[b_idx].astype(np.int64),
        }
        if tag_chained:
            # pair came from a capped bucket's chain fallback (recall
            # provenance for the post-verification clustering option)
            out["chained"] = sizes[gid][b_idx] > bucket_cap
        for col in carry:
            vals = g[col].to_numpy()[order]
            out[f"{col}_a"] = vals[a_idx]
            out[f"{col}_b"] = vals[b_idx]
        return pd.DataFrame(out)

    return emit


_FOLD_INIT = np.uint64(0xCBF29CE484222325)  # fnv offset basis, any constant works

# ASCII-whitespace word boundary: identical token sets under polars (Rust
# regex) and DuckDB (RE2), so hashed-shingle SET comparisons (Jaccard) are
# SQL-twinnable — Rust \S would also exclude U+00A0 etc. and silently
# diverge on non-ASCII corpora
_SHINGLE_WORD_RE = r"[^\t\n\f\r ]+"


def shingle_hash_csr(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """texts (polars Series[str]) -> (flat shingle hashes u64, CSR offsets).

    offsets has len(texts)+1 entries; doc d's word-k-gram hashes are
    flat[offsets[d]:offsets[d+1]] and every doc has >= 1 entry (short docs
    collapse to one gram of all their words, empty docs to the empty gram).
    Fully vectorized: one regex extract, one xxhash over the exploded word
    column, a k-pass splitmix fold over shifted views (doc boundaries masked
    out).  Distinct hashes correspond to distinct word k-grams up to 64-bit
    collisions (~n²/2⁶⁵ per doc pair — negligible)."""
    pl = worker_polars()

    words = texts.str.extract_all(_SHINGLE_WORD_RE)
    lens = words.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = words.explode(empty_as_null=False).drop_nulls()
    wh = flat.hash(seed=12345).to_numpy().astype(np.uint64, copy=False)
    total = len(wh)
    word_off = np.concatenate(([0], np.cumsum(lens)))

    # long docs (L >= k): rolling k-fold over the flat array, then keep
    # only starts that do not cross a doc boundary
    n_roll = max(total - k + 1, 0)
    with np.errstate(over="ignore"):
        g = np.full(n_roll, _FOLD_INIT, dtype=np.uint64)
        for j in range(k):
            g = (g ^ wh[j : j + n_roll]) * _GOLDEN
        g ^= g >> np.uint64(29)
    counts = np.where(lens >= k, lens - k + 1, 0)
    csum = np.concatenate(([0], np.cumsum(counts)))
    intra = np.arange(csum[-1], dtype=np.int64) - np.repeat(csum[:-1], counts)
    valid_starts = np.repeat(word_off[:-1], counts) + intra
    long_sh = g[valid_starts] if n_roll else np.empty(0, np.uint64)

    # short docs (0 < L < k): one gram folding all L words — vectorized
    # per length class (at most k-1 classes, each a gather + fold)
    n_sh = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    out_off = np.concatenate(([0], np.cumsum(n_sh)))
    sh_flat = np.empty(out_off[-1], dtype=np.uint64)
    sh_flat[np.repeat(out_off[:-1], counts) + intra] = long_sh
    with np.errstate(over="ignore"):
        empty_hash = (_FOLD_INIT ^ np.uint64(0)) * _GOLDEN
    for L in range(0, k):
        docs_L = np.flatnonzero(lens == L)
        if len(docs_L) == 0:
            continue
        if L == 0:
            sh_flat[out_off[docs_L]] = empty_hash
            continue
        idx = word_off[docs_L][:, None] + np.arange(L)[None, :]
        with np.errstate(over="ignore"):
            gL = np.full(len(docs_L), _FOLD_INIT, dtype=np.uint64)
            for j in range(L):
                gL = (gL ^ wh[idx[:, j]]) * _GOLDEN
            gL ^= gL >> np.uint64(29)
        sh_flat[out_off[docs_L]] = gL
    return sh_flat, out_off


class MinHasher:
    """Word-shingle MinHash signatures, fully vectorized (runs as plain
    tasks via ``_minhash_stage``'s process-level instance cache — the
    seed-table state costs microseconds, not an actor pool).

    No per-document Python: tokenization is one polars regex extract over the
    whole batch, word hashing is polars xxhash64 over the exploded word
    column, shingle hashes are a k-pass splitmix fold over shifted views of
    the flat word-hash array (doc boundaries masked out), and the per-doc
    permutation minimum is ``np.minimum.reduceat`` over a CSR layout.

    Permutations are splitmix-style multiplicative hashes in uint64
    ((h ^ seed_k) * GOLDEN, wrapping) — well-mixed and overflow-defined,
    unlike an (a*h+b) mod p construction whose int64 product would silently
    wrap before the modulo.  Duplicate shingles within a doc need no
    dedup — the min over a multiset equals the min over its support."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 7,
                 perm_chunk: int = 16):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        # the permutation-min runs in 32 bits: half the memory traffic of a
        # u64 family (the min scan is bandwidth-bound), and a collision adds
        # ~n_shingles/2^32 spurious agreement per permutation — negligible
        self.seeds32 = (self.seeds >> np.uint64(32)).astype(np.uint32)
        self.num_perm = num_perm
        self.shingle = shingle
        self.perm_chunk = perm_chunk

    def _shingle_hashes(self, texts) -> tuple[np.ndarray, np.ndarray]:
        return shingle_hash_csr(texts, self.shingle)

    def signatures(self, texts) -> np.ndarray:
        """texts (polars Series[str]) -> (n_docs, num_perm) int64 matrix."""
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.int64)
        sh_flat, out_off = self._shingle_hashes(texts)
        sh32 = (sh_flat >> np.uint64(32)).astype(np.uint32)
        sig = np.empty((n, self.num_perm), dtype=np.int64)
        starts = out_off[:-1]
        # chunk the permutation axis so the expanded (chunk x n_shingles)
        # matrix stays bounded regardless of batch size; reuse the buffer
        vals = np.empty((min(self.perm_chunk, self.num_perm), len(sh32)), np.uint32)
        G32 = np.uint32(0x9E3779B9)
        for p0 in range(0, self.num_perm, self.perm_chunk):
            seeds = self.seeds32[p0 : p0 + self.perm_chunk]
            v = vals[: len(seeds)]
            np.bitwise_xor(sh32[None, :], seeds[:, None], out=v)
            with np.errstate(over="ignore"):
                np.multiply(v, G32, out=v)
            sig[:, p0 : p0 + len(seeds)] = np.minimum.reduceat(v, starts, axis=1).T
        return sig

    def signature(self, text: str) -> np.ndarray:
        pl = worker_polars()

        return self.signatures(pl.Series([text]))[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = worker_polars()

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sigs = self.signatures(pl.from_arrow(text))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), type=pa.int64()), self.num_perm
                ).cast(pa.list_(pa.int64())),
            }
        )


# Hasher state (seed tables) costs microseconds to build, so the signature
# stages run as plain TASKS with a process-level instance cache instead of
# an actor pool: Ray reuses worker processes, the cache makes setup
# once-per-worker, and the stage parallelism is no longer capped at
# ``concurrency`` actors (16 fresh actor processes cost seconds of spawn +
# import wall — the old fixed cost of every dedup run).
_HASHER_CACHE: dict = {}


def _minhash_stage(num_perm: int, shingle: int):
    def fn(batch):
        key = ("minhash", num_perm, shingle)
        mh = _HASHER_CACHE.get(key)
        if mh is None:
            mh = _HASHER_CACHE[key] = MinHasher(num_perm, shingle)
        return mh(batch)

    return fn


def _simhash_stage():
    def fn(batch):
        sh = _HASHER_CACHE.get("simhash")
        if sh is None:
            sh = _HASHER_CACHE["simhash"] = SimHasher()
        return sh(batch)

    return fn


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    jaccard_threshold: float = 0.6,
    concurrency: int | None = None,
    bucket_cap: int = 500,
    chain_keep_threshold: float | None = None,
):
    """Near-duplicate pairs via MinHash-LSH + exact signature-Jaccard verify.

    Returns doc_a, doc_b (doc_a < doc_b), est_jaccard (float).

    ``chain_keep_threshold``: the capped-bucket chain fallback guarantees
    connectivity only PRE-verification — a chain link between two
    dissimilar sort-neighbors gets verified away, which can sever the only
    path between similar docs that landed non-adjacent in a degenerate
    bucket.  Setting this (e.g. 0.0) keeps chain-provenance pairs whose
    est_jaccard clears THIS lower bar, restoring the all-pairs
    connectivity guarantee for clustering; report-facing callers that need
    every emitted pair to be a verified near-dup leave it None (default,
    output unchanged).

    Scale design: banded rows carry ONLY (band, bucket:int64, doc_id) — 20
    bytes/row, not the full signature per band (round-1 shuffle carried the
    512-byte signature 16x).  Buckets larger than ``bucket_cap`` (degenerate
    boilerplate) fall back to a chain through the sorted bucket (same
    connected components as all-pairs, O(B) instead of O(B^2)).  Verification joins
    the candidate pairs back to signatures via a broadcast lookup bounded by
    the candidate count (the output size), never the corpus."""
    import ray

    if not 1 <= bands <= num_perm:
        raise ValueError(
            f"minhash_lsh_pairs: bands={bands} must be in [1, num_perm="
            f"{num_perm}] — bands > num_perm degenerates every band bucket "
            "to a constant (all docs flood one bucket per band)"
        )
    if num_perm % bands:
        raise ValueError(
            f"minhash_lsh_pairs: bands={bands} must divide num_perm="
            f"{num_perm} — a remainder silently drops the trailing "
            "permutations and changes the LSH threshold curve"
        )
    rows_per_band = num_perm // bands
    # materialized once: the signature table (num_perm x 8 B/doc, far smaller
    # than the text corpus, spills to the object store) feeds both the band
    # explode and the verification lookup without recomputing the shingling
    # bounded batch_size: a whole 25k-row block would peak ~150 MB of numpy
    # temporaries per actor (perm_chunk x n_shingles expansion) — first-touch
    # page faults at that size measurably serialize on fresh worker heaps;
    # ~2k docs keeps per-call temporaries ~10 MB so the arena is reused
    # concurrency=None lets Ray Data size the task pool (the signature
    # stage is plain tasks since round 5); pass a value only to CAP the
    # concurrent signature tasks (memory guard for very large documents)
    sigs = ds.map_batches(
        _minhash_stage(num_perm, shingle),
        batch_format="pyarrow",
        batch_size=2048,
        **({} if concurrency is None else {"concurrency": concurrency}),
    ).materialize()

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        n = len(doc)
        sig = _sig_matrix(batch["sig"], num_perm).astype(np.uint64)
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        out_doc = np.tile(doc, bands)
        out_bucket = np.empty(bands * n, dtype=np.int64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
                # vectorized splitmix fold of the band chunk -> 64-bit bucket
                h = np.full(n, np.uint64(b + 1))
                for c in range(chunk.shape[1]):
                    h = (h ^ chunk[:, c]) * _GOLDEN
                h ^= h >> np.uint64(29)
                out_bucket[b * n : (b + 1) * n] = h.view(np.int64)
        return pa.table(
            {
                "band": pa.array(out_band),
                "bucket": pa.array(out_bucket),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    # hash-partition buckets into a BOUNDED number of groups (bucket is
    # already a mixed 64-bit hash that folds the band id in) and emit all
    # within-bucket pairs vectorized — one map_groups call per partition,
    # never one per LSH bucket
    n_parts = default_n_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch["bucket"].to_numpy() % n_parts).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    tag_chained = chain_keep_threshold is not None
    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            _bucket_pair_stage(
                ("band", "bucket"), bucket_cap, tag_chained=tag_chained
            ),
            batch_format="pandas",
        )
    )
    # dedup pairs found in multiple bands (partitioned vectorized distinct)
    uniq_pairs = _dedup_pairs(pairs, or_col="chained" if tag_chained else None)

    # verification: broadcast a doc -> signature lookup bounded by the
    # candidate set, estimate Jaccard per pair, filter by threshold
    pairs_pd = uniq_pairs.to_pandas()  # bounded by output size
    if len(pairs_pd) == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {"doc_a": pd.Series(dtype=np.int64),
                 "doc_b": pd.Series(dtype=np.int64),
                 "est_jaccard": pd.Series(dtype=np.float64)}
            )
        )
    cand_docs = np.union1d(pairs_pd["doc_a"].to_numpy(), pairs_pd["doc_b"].to_numpy())
    cand_ref = ray.put(np.sort(cand_docs))

    def filter_sigs(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        doc = batch["doc_id"].to_numpy()
        idx = np.searchsorted(cand, doc)
        keep = (idx < len(cand)) & (cand[np.clip(idx, 0, len(cand) - 1)] == doc)
        return batch.filter(pa.array(keep))

    cand_tbl = pa.concat_tables(
        ray.get(sigs.map_batches(filter_sigs, batch_format="pyarrow").to_arrow_refs())
    )  # bounded by the candidate set
    sig_mat = _sig_matrix(cand_tbl["sig"], num_perm)
    cand_doc = cand_tbl["doc_id"].to_numpy()
    order = np.argsort(cand_doc)
    sig_mat = sig_mat[order]
    sorted_docs = cand_doc[order]

    # vectorized verification over the (bounded) candidate pair list
    ia = np.searchsorted(sorted_docs, pairs_pd["doc_a"].to_numpy())
    ib = np.searchsorted(sorted_docs, pairs_pd["doc_b"].to_numpy())
    est = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
    out = pd.DataFrame(
        {
            "doc_a": pairs_pd["doc_a"].to_numpy(np.int64),
            "doc_b": pairs_pd["doc_b"].to_numpy(np.int64),
            "est_jaccard": est.astype(np.float64),
        }
    )
    keep = out["est_jaccard"] >= jaccard_threshold
    if tag_chained:
        keep |= pairs_pd["chained"].to_numpy() & (
            out["est_jaccard"] >= chain_keep_threshold
        )
    out = out[keep].reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


# -- SimHash ---------------------------------------------------------------

class SimHasher:
    """64-bit SimHash fingerprints over word hashes (actor-pool stage).

    Fully vectorized per batch: tokenization and per-doc word dedup are
    polars list ops (one regex extract + ``list.unique``), word hashing is
    polars xxhash64 over the exploded column, bit contributions accumulate
    with one ``np.add.at`` scatter, and fingerprints pack with
    ``np.packbits`` — no per-document Python."""

    _WORD_SEED = 54321

    @staticmethod
    def _batch_fingerprints(texts) -> np.ndarray:
        """texts (polars Series[str]) -> uint64 fingerprints."""
        n = len(texts)
        words = texts.str.extract_all(r"\S+").list.unique()
        lens = words.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = words.explode(empty_as_null=False).drop_nulls()
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(flat):
            hs = flat.hash(seed=SimHasher._WORD_SEED).to_numpy().astype(
                np.uint64, copy=False
            )
            bits = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)  # bits[:, k] == (h >> k) & 1 (little-endian)
            doc_idx = np.repeat(np.arange(n), lens)
            np.add.at(acc, doc_idx, 2 * bits - 1)
        fps = np.packbits((acc > 0).astype(np.uint8), axis=1, bitorder="little")
        return fps.view(np.uint64).ravel()

    @staticmethod
    def fingerprint(text: str) -> int:
        pl = worker_polars()

        return int(SimHasher._batch_fingerprints(pl.Series([text]))[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = worker_polars()

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(self._batch_fingerprints(pl.from_arrow(text))),
            }
        )


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    concurrency: int | None = None,
    bands: int = 4,
    bucket_cap: int = 500,
):
    """Near-dup pairs with hamming distance <= max_hamming, via band
    bucketing over ``bands`` equal chunks of the 64-bit fingerprint.

    Recall guarantee needs ``max_hamming < bands`` (pigeonhole: some band is
    then error-free); use bands=8 for distances up to 7.  Buckets above
    ``bucket_cap`` (boilerplate skew) fall back to a chain through the
    sorted bucket — same connected components, O(B) work instead of O(B^2)."""
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    # see minhash_lsh_pairs: None = Ray-sized task pool, value = cap
    fps = ds.map_batches(
        _simhash_stage(),
        batch_format="pyarrow",
        batch_size=4096,
        **({} if concurrency is None else {"concurrency": concurrency}),
    )

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        fp = batch["simhash"].to_numpy()
        n = len(doc)
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        out_bucket = np.concatenate(
            [((fp >> np.uint64(width * b)) & mask).astype(np.int64) for b in range(bands)]
        ) if n else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "band": pa.array(out_band),
                "bucket": pa.array(out_bucket),
                "doc_id": pa.array(np.tile(doc, bands), type=pa.int64()),
                "simhash": pa.array(np.tile(fp, bands)),
            }
        )

    banded = fps.map_batches(explode, batch_format="pyarrow")

    n_parts = default_n_parts()
    pair_stage = _bucket_pair_stage(("band", "bucket"), bucket_cap,
                                    carry=("simhash",))

    def add_part(batch: pa.Table) -> pa.Table:
        return _add_band_part(batch, n_parts)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        fa = g["simhash_a"].to_numpy().astype(np.uint64)
        fb = g["simhash_b"].to_numpy().astype(np.uint64)
        diff = (fa ^ fb).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(diff, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].to_numpy()[keep],
                "doc_b": g["doc_b"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: verify(pair_stage(g)), batch_format="pandas"
        )
    )
    return _dedup_pairs(pairs, min_col="hamming")


def jaccard_verify_pairs(docs_ds, pairs: pd.DataFrame, shingle: int = 3,
                         n_parts: int | None = None):
    """Exact word n-gram Jaccard for a set of candidate pairs — the
    distributed verify step after any LSH/banding stage.

    ``pairs`` is a bounded (doc_a, doc_b) frame (candidate pairs are the
    OUTPUT size of near-dup detection, not the corpus size).  Returns
    doc_a, doc_b, jaccard (float64); pairs whose docs are absent from the
    corpus are dropped (inner-join semantics, like the SQL twin).

    Scale design: one pruned corpus pass emits (pair, side, shingle-hash)
    rows only for candidate docs (broadcast sorted membership lookup, one
    vectorized shingle pass per batch, per-doc dedup via lexsort); pairs
    then hash-partition into O(cores) groups where intersections for ALL
    pairs of a partition are counted at once (adjacent-duplicate scan over
    the (pair, hash) sort — hashes are unique within a side, so an adjacent
    equal hash means both sides contain it).  Distinct 64-bit shingle hashes
    stand in for distinct word n-grams (collision odds ~n²/2⁶⁵ per pair),
    which is what makes the result equal to the string-trigram SQL twin."""
    import ray

    n_parts = n_parts or default_n_parts()
    if len(pairs) == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "jaccard": pd.Series(dtype=np.float64),
                }
            )
        )
    # duplicate pair rows would double-count na/nb AND the adjacent-hash
    # intersection scan (silently wrong Jaccard) — dedup the bounded frame
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"])
    pa_arr = pairs["doc_a"].to_numpy().astype(np.int64)
    pb_arr = pairs["doc_b"].to_numpy().astype(np.int64)
    # membership table: doc -> (doc_a, doc_b, side) rows, sorted by doc
    mdoc = np.concatenate([pa_arr, pb_arr])
    m_a = np.concatenate([pa_arr, pa_arr])
    m_b = np.concatenate([pb_arr, pb_arr])
    m_side = np.concatenate(
        [np.zeros(len(pa_arr), np.int8), np.ones(len(pb_arr), np.int8)]
    )
    order = np.argsort(mdoc, kind="stable")
    membership_ref = ray.put(
        (mdoc[order], m_a[order], m_b[order], m_side[order])
    )

    def explode_stage(batch: pa.Table) -> pa.Table:
        pl = worker_polars()

        mdoc_s, ma_s, mb_s, ms_s = ray.get(membership_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(mdoc_s, ids, side="left")
        hi = np.searchsorted(mdoc_s, ids, side="right")
        keep = hi > lo
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
                "h": pa.array([], type=pa.uint64()),
            }
        )
        if not keep.any():
            return empty
        kept = batch.filter(pa.array(keep))
        lo, hi, ids = lo[keep], hi[keep], ids[keep]
        text = kept["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sh, off = shingle_hash_csr(pl.from_arrow(text), shingle)
        # per-doc distinct shingles (lexsort + boundary dedup, no per-doc
        # Python)
        doc_rep = np.repeat(
            np.arange(len(ids), dtype=np.int64), np.diff(off)
        )
        o = np.lexsort((sh, doc_rep))
        dr, hs = doc_rep[o], sh[o]
        first = np.concatenate(
            ([True], (dr[1:] != dr[:-1]) | (hs[1:] != hs[:-1]))
        )
        dr, hs = dr[first], hs[first]
        # fan each distinct-shingle row out to its doc's pair memberships
        mcount = (hi - lo).astype(np.int64)
        reps = mcount[dr]
        total = int(reps.sum())
        if total == 0:
            return empty
        intra = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(reps)))[:-1], reps)
        )
        midx = np.repeat(lo[dr], reps) + intra
        return pa.table(
            {
                "doc_a": pa.array(ma_s[midx]),
                "doc_b": pa.array(mb_s[midx]),
                "side": pa.array(ms_s[midx]),
                "h": pa.array(np.repeat(hs, reps)),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        return _add_pair_part(batch, n_parts)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        side = g["side"].to_numpy()
        h = g["h"].to_numpy()
        if len(a) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=np.int64),
                    "doc_b": pd.Series(dtype=np.int64),
                    "jaccard": pd.Series(dtype=np.float64),
                }
            )
        o = np.lexsort((side, h, b, a))
        a, b, side, h = a[o], b[o], side[o], h[o]
        new_pair = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        pid = np.cumsum(new_pair) - 1
        n_pairs = int(pid[-1]) + 1
        adj = (pid[1:] == pid[:-1]) & (h[1:] == h[:-1])
        inter = np.bincount(pid[1:][adj], minlength=n_pairs)
        na = np.bincount(pid[side == 0], minlength=n_pairs)
        nb = np.bincount(pid[side == 1], minlength=n_pairs)
        present = (na > 0) & (nb > 0)
        union = na + nb - inter
        firsts = np.flatnonzero(new_pair)
        return pd.DataFrame(
            {
                "doc_a": a[firsts][present].astype(np.int64),
                "doc_b": b[firsts][present].astype(np.int64),
                "jaccard": (inter[present] / union[present]).astype(
                    np.float64
                ),
            }
        )

    return (
        docs_ds.map_batches(explode_stage, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: verify(g.drop(columns=["part"])), batch_format="pandas"
        )
    )


def benchmark_ngram_hashes(texts, n: int = 13) -> np.ndarray:
    """Sorted distinct word-``n``-gram hashes of a benchmark / eval set.

    ``texts`` is a polars Series[str] (or anything ``pl.Series`` accepts).
    Uses the exact ``shingle_hash_csr`` kernel the corpus side probes with,
    so membership is hash-equal iff the word n-gram is string-equal (up to
    the documented ~1/2⁶⁴ collision odds).  The empty-gram sentinel (rows
    with zero words) is dropped — an empty benchmark row must not flag
    every empty training doc."""
    pl = worker_polars()

    if not isinstance(texts, pl.Series):
        texts = pl.Series([t if t is None else str(t) for t in texts])
    if texts.dtype != pl.String:  # empty/all-null inputs infer Null dtype
        texts = texts.cast(pl.String)
    sh, _off = shingle_hash_csr(texts, n)
    with np.errstate(over="ignore"):
        empty_hash = (_FOLD_INIT ^ np.uint64(0)) * _GOLDEN
    return np.unique(sh[sh != empty_hash])


def decontaminate(docs_ds, benchmark, n: int = 13, text_col: str = "text",
                  id_col: str = "doc_id", bench_text_col: str = "text"):
    """Flag training documents sharing any word ``n``-gram with a benchmark
    set (the classic 13-gram eval-decontamination rule).

    Returns one row per input doc: ``(id_col, matched_ngrams int64,
    total_ngrams int64, contaminated bool)``.  Docs shorter than ``n``
    words probe ONE gram folding all their words (so an exact short-text
    benchmark hit still flags — same collapse rule as the MinHash
    shingler); empty/null docs never flag.

    Scale shape (100 TB corpus, small eval side — the only shape the
    operator supports): the benchmark's distinct n-gram hashes build once
    into ONE sorted uint64 array shipped via ``ray.put`` (workers read it
    zero-copy from plasma per task — numpy over the object store, never
    re-serialized per batch).  The corpus streams through a single
    ``map_batches``: per-batch CSR shingling (the shared
    ``shingle_hash_csr`` kernel), one ``np.searchsorted`` membership probe,
    per-doc hit counts via ``np.add.reduceat`` — no shuffle, no
    materialization, no per-row Python."""
    import ray

    pl = worker_polars()

    if hasattr(benchmark, "to_arrow_refs"):  # a (small) ray Dataset
        tables = ray.get(benchmark.select_columns([bench_text_col]).to_arrow_refs())
        tables = [t for t in tables if t.num_rows]
        col = (
            pa.concat_tables(tables)[bench_text_col].combine_chunks()
            if tables
            else pa.array([], type=pa.string())
        )
        texts = pl.from_arrow(col)
    elif isinstance(benchmark, pd.DataFrame):
        texts = pl.from_pandas(benchmark[bench_text_col])
    else:  # sequence of strings / polars Series
        texts = benchmark
    bench = benchmark_ngram_hashes(texts, n)
    bench_ref = ray.put(bench)

    # pin the id column's face once so zero-row/schemaless blocks from long
    # plans cannot drift the output schema
    id_type = dict(zip(docs_ds.schema().names, docs_ds.schema().types)).get(id_col)
    if not isinstance(id_type, pa.DataType):
        id_type = pa.int64()
    elif pa.types.is_dictionary(id_type):
        id_type = id_type.value_type
    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("matched_ngrams", pa.int64()),
            ("total_ngrams", pa.int64()),
            ("contaminated", pa.bool_()),
        ]
    )

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_col not in batch.schema.names:
            return out_schema.empty_table()
        pl = worker_polars()

        bench_sorted = ray.get(bench_ref)  # zero-copy plasma read
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        counts, totals = _contam_counts(pl.from_arrow(text), bench_sorted, n)
        return pa.table(
            {
                id_col: batch[id_col],
                "matched_ngrams": pa.array(counts.astype(np.int64)),
                "total_ngrams": pa.array(totals.astype(np.int64)),
                "contaminated": pa.array(counts > 0),
            }
        ).cast(out_schema)

    return docs_ds.map_batches(stage, batch_format="pyarrow")


def decontaminate_sql(docs_table: str = "documents",
                      bench_where: str = "doc_id % 101 = 7",
                      n: int = 13, bench_table: str | None = None) -> str:
    """DuckDB twin of :func:`decontaminate` where the benchmark side is a
    predicate-selected slice of ``bench_table`` (default: the corpus table
    itself — the gate-row shape).

    Equivalent on STRING n-grams: the kernel's 64-bit hash membership
    equals string membership up to the documented ~1/2^64 collision odds
    (words contain no spaces, so joining with ' ' is injective).  Mirrors
    the kernel's collapse rules exactly: docs with 0 < L < n words probe
    ONE gram folding all words; empty docs probe nothing but still report
    total_ngrams = 1 (the CSR pseudo-entry); the benchmark side drops its
    empty-doc grams."""
    gram_case = f"""
         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w) - {n - 2}),
                                  i -> array_to_string(w[i:i+{n - 1}], ' '))
         END"""
    if bench_table is None:
        bench_cte = (
            f"SELECT DISTINCT unnest(g) AS gram FROM dc_grams"
            f" WHERE {bench_where}"
        )
    else:
        bench_cte = f"""
  SELECT DISTINCT unnest({gram_case}) AS gram
  FROM (SELECT regexp_extract_all(COALESCE(text, ''), '[^\t\n\f\r ]+') AS w
        FROM {bench_table} WHERE {bench_where})"""
    return f"""
WITH dc_w AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '[^\t\n\f\r ]+') AS w
  FROM {docs_table}
), dc_grams AS (
  SELECT doc_id,
         {gram_case} AS g,
         greatest(len(w) - {n - 1}, 1) AS total
  FROM dc_w
), dc_bench AS (
  {bench_cte}
), dc_probe AS (
  SELECT doc_id, unnest(g) AS gram FROM dc_grams
), dc_hits AS (
  SELECT p.doc_id, count(*) AS matched
  FROM dc_probe p JOIN dc_bench b ON p.gram = b.gram
  GROUP BY p.doc_id
)
SELECT g.doc_id,
       CAST(COALESCE(h.matched, 0) AS BIGINT) AS matched_ngrams,
       CAST(g.total AS BIGINT) AS total_ngrams,
       COALESCE(h.matched, 0) > 0 AS contaminated
FROM dc_grams g LEFT JOIN dc_hits h USING (doc_id)"""


def _contam_counts(texts_pl, bench_sorted: np.ndarray, n: int):
    """(matched-gram counts, total grams probed) per doc — the per-batch
    membership probe SHARED by ``decontaminate`` and ``clean_corpus``'s
    fused gate."""
    sh, off = shingle_hash_csr(texts_pl, n)
    if len(bench_sorted):
        pos = np.searchsorted(bench_sorted, sh)
        hit = np.zeros(len(sh), dtype=np.int64)
        inb = pos < len(bench_sorted)
        hit[inb] = (bench_sorted[pos[inb]] == sh[inb]).astype(np.int64)
    else:
        hit = np.zeros(len(sh), dtype=np.int64)
    # every doc owns >= 1 CSR entry, so reduceat over starts is total
    counts = np.add.reduceat(hit, off[:-1]) if len(sh) else np.zeros(0, np.int64)
    return counts, np.diff(off)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard (the verification oracle for LSH pairs)."""

    def grams(t: str) -> set:
        w = t.split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)
