"""Deduplication pipelines over the ``documents`` table (SURVEY mandate:
exact, MinHash+LSH, SimHash, n-gram Jaccard verification).

Scale design notes (100 TB):
- exact dedup: content-hash inside ``map_batches`` (vectorized), then
  hash-partitioned ``groupby(content_hash).map_groups(first)`` — the shuffle
  carries (hash, id) pairs, never document bodies twice.
- MinHash-LSH: per-batch shingling + minhashing (vectorized over a word-id
  matrix), explode to (band, bucket, doc) rows, ``groupby(band, bucket)``
  emits candidate pairs, exact-Jaccard verification filters false positives.
  Every stage is a batch transform; only candidate pairs (tiny) leave the
  shuffle.
- SimHash: 64-bit fingerprints, banded into 4x16-bit chunks for bucketing;
  hamming-distance verification per bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def with_planted_duplicates(ds, every: int = 7, offset: int = 10_000):
    """documents + deterministic copies: every ``every``-th doc_id reappears
    with doc_id + offset (exact duplicate) — SQL-replicable."""

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy() if not isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"].combine_chunks().to_numpy()
        mask = pa.array(ids % every == 0)
        dups = batch.filter(mask)
        dups = dups.set_column(
            dups.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(dups["doc_id"], offset),
        )
        return pa.concat_tables([batch, dups])

    return ds.map_batches(dup, batch_format="pyarrow")


def exact_dedup(ds):
    """Keep the smallest doc_id per distinct text.  Returns doc_id, n_copies.

    Content hashing is vectorized (polars xxhash64 with two independent seeds
    -> a 128-bit key, collision-safe at web scale), and the conquer step is a
    plain ``groupby.aggregate(Min, Count)`` — no per-group pandas frames, the
    shuffle carries only (h1, h2, doc_id) triples."""
    from ray.data.aggregate import Count, Min

    def hash_stage(batch: pa.Table) -> pa.Table:
        import polars as pl

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pl.from_arrow(text)
        return pa.table(
            {
                "h1": pa.array(s.hash(seed=1).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=2).to_numpy().view(np.int64)),
                "doc_id": batch["doc_id"],
            }
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    agg = hashed.groupby(["h1", "h2"]).aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_copies": batch["n_copies"].cast(pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


# -- MinHash + LSH ---------------------------------------------------------

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


class MinHasher:
    """Actor-pool stage: word-shingle MinHash signatures (setup once).

    Permutations are splitmix-style multiplicative hashes in uint64
    ((h ^ seed_k) * GOLDEN, wrapping) — well-mixed and overflow-defined,
    unlike an (a*h+b) mod p construction whose int64 product would silently
    wrap before the modulo."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        words = text.split()
        if len(words) < self.shingle:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [
                " ".join(words[i : i + self.shingle])
                for i in range(len(words) - self.shingle + 1)
            ]
        h = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
                for g in set(grams)
            ),
            dtype=np.uint64,
        )
        with np.errstate(over="ignore"):
            vals = (h[None, :] ^ self.seeds[:, None]) * _GOLDEN
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(t) for t in batch["text"].to_pylist()]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(list(sigs), type=pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    jaccard_threshold: float = 0.6,
    concurrency: int = 2,
    bucket_cap: int = 500,
):
    """Near-duplicate pairs via MinHash-LSH + exact signature-Jaccard verify.

    Returns doc_a, doc_b (doc_a < doc_b), est_jaccard (float).

    Scale design: banded rows carry ONLY (band, bucket:int64, doc_id) — 20
    bytes/row, not the full signature per band (round-1 shuffle carried the
    512-byte signature 16x).  Buckets larger than ``bucket_cap`` (degenerate
    boilerplate) pair each member with the bucket's min doc (star topology —
    same connected components, O(B) instead of O(B^2)).  Verification joins
    the candidate pairs back to signatures via a broadcast lookup bounded by
    the candidate count (the output size), never the corpus."""
    import ray

    rows_per_band = num_perm // bands
    # materialized once: the signature table (num_perm x 8 B/doc, far smaller
    # than the text corpus, spills to the object store) feeds both the band
    # explode and the verification lookup without recomputing the shingling
    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        fn_constructor_args=(num_perm, shingle),
        concurrency=concurrency,
    ).materialize()

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        sig = np.stack(batch["sig"].to_pylist()).astype(np.uint64)
        n = len(doc)
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

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(g["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype=np.int64),
                 "doc_b": pd.Series(dtype=np.int64)}
            )
        if len(docs) > bucket_cap:
            # star: every member pairs with the min doc — O(B) pairs
            a = np.full(len(docs) - 1, docs[0], dtype=np.int64)
            b = docs[1:]
        else:
            ii, jj = np.triu_indices(len(docs), k=1)
            a, b = docs[ii], docs[jj]
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = banded.groupby(["band", "bucket"]).map_groups(
        candidates, batch_format="pandas"
    )
    # dedup pairs found in multiple bands (tiny groupby over candidate pairs)
    uniq_pairs = pairs.groupby(["doc_a", "doc_b"]).count().drop_columns(["count()"])

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

    cand_sigs = sigs.map_batches(filter_sigs, batch_format="pyarrow").to_pandas()
    sig_mat = np.stack(cand_sigs["sig"].to_numpy())
    order = np.argsort(cand_sigs["doc_id"].to_numpy())
    sig_mat = sig_mat[order]
    sorted_docs = cand_sigs["doc_id"].to_numpy()[order]

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
    out = out[out["est_jaccard"] >= jaccard_threshold].reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


# -- SimHash ---------------------------------------------------------------

class SimHasher:
    """64-bit SimHash fingerprints over word hashes (actor-pool stage).

    Per-batch work is vectorized: unique words hash through a per-actor
    cache, bit contributions accumulate with one ``np.add.at`` scatter, and
    fingerprints pack with ``np.packbits`` — no per-document bit loops."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _word_hash(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
            )
            self._cache[w] = h
        return h

    @staticmethod
    def fingerprint(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(text.split()):
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
            ))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == np.uint64(1), 1, -1)
        fp = 0
        for k in np.flatnonzero(acc > 0):
            fp |= 1 << int(k)
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_idx: list[int] = []
        words: list[str] = []
        for i, t in enumerate(texts):
            ws = set(t.split())
            words.extend(ws)
            doc_idx.extend([i] * len(ws))
        if words:
            hs = np.fromiter(
                (self._word_hash(w) for w in words), dtype=np.uint64, count=len(words)
            )
            bits = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)  # bits[:, k] == (h >> k) & 1 (little-endian)
            acc = np.zeros((len(texts), 64), dtype=np.int64)
            np.add.at(acc, np.asarray(doc_idx), 2 * bits - 1)
        else:
            acc = np.zeros((len(texts), 64), dtype=np.int64)
        fps = np.packbits((acc > 0).astype(np.uint8), axis=1, bitorder="little")
        fps = fps.view(np.uint64).ravel()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(fps),
            }
        )


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    concurrency: int = 2,
    bands: int = 4,
    bucket_cap: int = 500,
):
    """Near-dup pairs with hamming distance <= max_hamming, via band
    bucketing over ``bands`` equal chunks of the 64-bit fingerprint.

    Recall guarantee needs ``max_hamming < bands`` (pigeonhole: some band is
    then error-free); use bands=8 for distances up to 7.  Buckets above
    ``bucket_cap`` (boilerplate skew) fall back to a star around the min doc
    — same connected components, O(B) work instead of O(B^2)."""
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    fps = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

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

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype=np.int64),
             "doc_b": pd.Series(dtype=np.int64),
             "hamming": pd.Series(dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return empty
        docs = g["doc_id"].to_numpy()
        fps_ = g["simhash"].to_numpy().astype(np.uint64)
        bits = np.unpackbits(fps_.view(np.uint8).reshape(n, 8), axis=1)
        if n > bucket_cap:
            ham = (bits[:1] != bits[1:]).sum(axis=1)
            keep = ham <= max_hamming
            return pd.DataFrame(
                {
                    "doc_a": np.full(int(keep.sum()), docs[0], dtype=np.int64),
                    "doc_b": docs[1:][keep].astype(np.int64),
                    "hamming": ham[keep].astype(np.int64),
                }
            )
        ii, jj = np.triu_indices(n, k=1)
        ham = (bits[ii] != bits[jj]).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": docs[ii[keep]].astype(np.int64),
                "doc_b": docs[jj[keep]].astype(np.int64),
                "hamming": ham[keep].astype(np.int64),
            }
        )

    pairs = banded.groupby(["band", "bucket"]).map_groups(
        candidates, batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
