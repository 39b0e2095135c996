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


def embedding_neardup_pairs(ds, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t).

    Small-side broadcast of the normalized corpus (fits for dimension-reduced
    fingerprints; the 100 TB path buckets by LSH first — see lsh_topk)."""
    import ray

    whole = ds.to_pandas()
    m = _normalize(
        np.stack(whole["embedding"].to_numpy()).astype(np.float64)
    )
    ids = whole["vec_id"].to_numpy(dtype=np.int64)
    m_ref = ray.put((m, ids))

    def pairs(batch: pa.Table) -> pa.Table:
        corpus, corpus_ids = ray.get(m_ref)
        mb = _normalize(_vec_matrix(batch))
        bids = batch["vec_id"].to_numpy()
        sims = mb @ corpus.T
        rows_a, rows_b = np.nonzero(sims >= threshold)
        a = bids[rows_a]
        b = corpus_ids[rows_b]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
