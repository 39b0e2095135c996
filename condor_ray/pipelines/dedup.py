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
    """Keep the smallest doc_id per distinct text.  Returns doc_id, n_copies."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(t.encode()).hexdigest()[:16]
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "content_hash": pa.array(hashes),
                "doc_id": batch["doc_id"],
            }
        )

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": [int(g["doc_id"].min())],
                "n_copies": [int(len(g))],
            }
        )

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")


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
):
    """Near-duplicate pairs via MinHash-LSH + exact signature-Jaccard verify.

    Returns doc_a, doc_b (doc_a < doc_b), est_jaccard (float).
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        fn_constructor_args=(num_perm, shingle),
        concurrency=concurrency,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        sig = np.stack(batch["sig"].to_pylist())
        out_band, out_bucket, out_doc, out_sig = [], [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            buckets = [
                hashlib.blake2b(c.tobytes(), digest_size=8).hexdigest()
                for c in chunk
            ]
            out_band.extend([b] * len(doc))
            out_bucket.extend(buckets)
            out_doc.extend(doc.tolist())
            out_sig.extend(sig.tolist())
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "sig": pa.array(out_sig, type=pa.list_(pa.int64())),
            }
        )

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype=np.int64),
                 "doc_b": pd.Series(dtype=np.int64),
                 "est_jaccard": pd.Series(dtype=np.float64)}
            )
        g = g.sort_values("doc_id")
        docs = g["doc_id"].to_numpy()
        sigs_ = np.stack(g["sig"].to_numpy())
        rows = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                if docs[i] == docs[j]:
                    continue
                est = float((sigs_[i] == sigs_[j]).mean())
                if est >= jaccard_threshold:
                    rows.append((int(docs[i]), int(docs[j]), est))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])

    pairs = banded.groupby(["band", "bucket"]).map_groups(
        candidates, batch_format="pandas"
    )

    # dedup pairs found in multiple bands
    def first_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        first_pair, batch_format="pandas"
    )


# -- SimHash ---------------------------------------------------------------

class SimHasher:
    """64-bit SimHash fingerprints over word hashes (actor-pool stage)."""

    def __init__(self):
        pass

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
        fps = [self.fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(np.asarray(fps, dtype=np.uint64)),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, concurrency: int = 2):
    """Near-dup pairs with hamming distance <= max_hamming, via 4x16-bit band
    bucketing (a pair within distance 3 shares at least one exact band)."""
    fps = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        fp = batch["simhash"].to_numpy()
        out = {"band": [], "bucket": [], "doc_id": [], "simhash": []}
        for b in range(4):
            chunk = (fp >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out["band"].extend([b] * len(doc))
            out["bucket"].extend(chunk.tolist())
            out["doc_id"].extend(doc.tolist())
            out["simhash"].extend(fp.tolist())
        return pa.table(
            {
                "band": pa.array(out["band"], type=pa.int32()),
                "bucket": pa.array(out["bucket"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "simhash": pa.array(np.asarray(out["simhash"], dtype=np.uint64)),
            }
        )

    banded = fps.map_batches(explode, batch_format="pyarrow")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(g) >= 2:
            g = g.sort_values("doc_id")
            docs = g["doc_id"].to_numpy()
            fps_ = g["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    if docs[i] == docs[j]:
                        continue
                    ham = bin(int(fps_[i]) ^ int(fps_[j])).count("1")
                    if ham <= max_hamming:
                        rows.append((int(docs[i]), int(docs[j]), ham))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

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
