"""Similarity search over the ``embeddings`` table (list<float> column).

- ``brute_force_topk``: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read in every task; no shuffle).
  The 100 TB path: the corpus streams in blocks, per-block top-k heaps merge
  in one tiny reduce.
- ``lsh_topk``: random-hyperplane LSH variant — corpus bucketed by sign
  patterns, queries probe their own bucket (+ multiprobe neighbors); the
  scale path trades recall for touching only matching buckets.
- ``embedding_neardup_pairs``: embedding-cosine near-duplicate detection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _vec_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or pa.types.is_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(batch.num_rows, -1)
    # Ray tensor extension arrays (from_pandas of ndarray columns)
    return np.asarray(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, query_vecs: np.ndarray, query_ids: np.ndarray, k: int = 10):
    """Exact cosine top-k of each query vector over the embedding corpus.

    Returns query_id, rank (1-based), vec_id — deterministic tie-break by
    (cosine DESC, vec_id ASC).  Per-batch partial top-k -> one small merge.
    """
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids, dtype=np.int64)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_vec_matrix(batch))
        ids = batch["vec_id"].to_numpy()
        sims = q @ m.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        # partial top-k per query within this batch
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q)):
            out_q.extend([int(qids[qi])] * kk)
            out_v.extend(ids[part[qi]].tolist())
            out_s.extend(sims[qi, part[qi]].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype(np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "vec_id": g["vec_id"].astype(np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class _LshIndexStage:
    """Actor-pool stage holding the hyperplane matrix (built once)."""

    def __init__(self, dim: int, n_planes: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_vec_matrix(batch))
        signs = (m @ self.planes.T) > 0
        buckets = np.zeros(len(m), dtype=np.int64)
        for b in range(signs.shape[1]):
            buckets |= signs[:, b].astype(np.int64) << b
        return batch.append_column("bucket", pa.array(buckets))


def lsh_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    concurrency: int = 2,
    probes: int = 1,
):
    """LSH-bucketed ANN: queries probe their own sign-bucket plus all
    buckets within ``probes`` bit flips (multiprobe).  Approximate — recall
    measured in tests; raise ``probes``/lower ``n_planes`` for recall,
    reverse for speed."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q_signs = (qn @ planes.T) > 0
    q_buckets = np.zeros(len(qn), dtype=np.int64)
    for b in range(n_planes):
        q_buckets |= q_signs[:, b].astype(np.int64) << b
    # multiprobe: own bucket + all buckets within `probes` bit flips
    from itertools import combinations

    flips = [0]
    for r in range(1, probes + 1):
        for combo in combinations(range(n_planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            flips.append(m)
    probe: dict[int, list[int]] = {}
    for qi, bkt in enumerate(q_buckets.tolist()):
        for m in flips:
            probe.setdefault(bkt ^ m, []).append(qi)
    probe_ref = ray.put(probe)
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids, dtype=np.int64)

    bucketed = ds.map_batches(
        _LshIndexStage,
        batch_format="pyarrow",
        fn_constructor_args=(dim, n_planes, seed),
        concurrency=concurrency,
    )

    def probe_buckets(batch: pa.Table) -> pa.Table:
        pr = ray.get(probe_ref)
        q = ray.get(q_ref)
        buckets = batch["bucket"].to_numpy()
        ids = batch["vec_id"].to_numpy()
        m = _normalize(_vec_matrix(batch))
        out_q, out_v, out_s = [], [], []
        for bkt in np.unique(buckets):
            wanting = pr.get(int(bkt))
            if not wanting:
                continue
            mask = buckets == bkt
            sims = q[wanting] @ m[mask].T
            sub_ids = ids[mask]
            for row, qi in enumerate(wanting):
                out_q.extend([int(qids[qi])] * len(sub_ids))
                out_v.extend(sub_ids.tolist())
                out_s.extend(sims[row].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = bucketed.map_batches(probe_buckets, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype(np.int64).to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "vec_id": g["vec_id"].astype(np.int64).to_numpy(),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class _MultiTableLshStage:
    """Actor-pool stage: sign-pattern bucket ids under L independent
    hyperplane tables (plane matrices built once per actor)."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = [
            rng.standard_normal((n_planes, dim)) for _ in range(n_tables)
        ]
        self.n_planes = n_planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_vec_matrix(batch))
        ids = batch["vec_id"].to_numpy()
        n = len(ids)
        weights = (1 << np.arange(self.n_planes, dtype=np.int64))[None, :]
        tables, buckets = [], []
        for t, planes in enumerate(self.planes):
            b = (((m @ planes.T) > 0).astype(np.int64) * weights).sum(axis=1)
            tables.append(np.full(n, t, dtype=np.int32))
            buckets.append(b)
        k = len(self.planes)
        dim = m.shape[1]
        # ship the NORMALIZED vectors as fixed-size lists built straight from
        # the numpy matrix (no per-row python conversion)
        flat = np.tile(m, (k, 1)).ravel()
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
        return pa.table(
            {
                "table": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets), type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, k), type=pa.int64()),
                "embedding": emb,
            }
        )


def embedding_neardup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    concurrency: int = 2,
    bucket_cap: int = 2000,
):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t).

    100 TB path: vectors are bucketed under ``n_tables`` independent
    random-hyperplane sign patterns (identical/near-identical vectors share
    every bucket); exact pairwise cosine runs only WITHIN each (table,
    bucket) group — never a corpus-wide materialization or O(n^2) scan.
    Pairs found in several tables dedup in a tiny final groupby.  Recall for
    cosine>=0.95 with 8 planes x 4 tables is ~0.9 (probabilistic; identical
    vectors are always found); oversize buckets chunk at ``bucket_cap`` rows
    (pairs computed within and across adjacent chunks of the id-sorted
    bucket, bounding memory at cap^2 while keeping duplicate runs paired)."""
    dim = len(ds.take(1)[0]["embedding"])
    bucketed = ds.map_batches(
        _MultiTableLshStage,
        batch_format="pyarrow",
        fn_constructor_args=(dim, n_planes, n_tables, seed),
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_a": pd.Series(dtype=np.int64),
             "vec_b": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64)}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        out = []
        for lo in range(0, len(ids), bucket_cap):
            hi = min(len(ids), lo + 2 * bucket_cap)  # overlap adjacent chunks
            sims = m[lo:hi] @ m[lo:hi].T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            if len(ii):
                out.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids[lo:hi][ii],
                            "vec_b": ids[lo:hi][jj],
                            "cosine": sims[ii, jj],
                        }
                    )
                )
            if hi == len(ids):
                break
        if not out:
            return empty
        res = pd.concat(out, ignore_index=True).drop_duplicates(["vec_a", "vec_b"])
        return res.astype(
            {"vec_a": np.int64, "vec_b": np.int64, "cosine": np.float64}
        )

    pairs = bucketed.groupby(["table", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def first_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)[["vec_a", "vec_b"]]

    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        first_pair, batch_format="pandas"
    )
