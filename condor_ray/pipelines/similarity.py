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

from ..runtime import default_n_parts


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


# Cosines are quantized to this many decimals BEFORE any top-k selection or
# merge: BLAS dgemm blocking varies with matrix shape, so the same duplicate
# vector scores cosines differing in the last ulp across differently-shaped
# Ray blocks — the (cosine DESC, vec_id ASC) tie-break then never sees an
# exact tie and the returned set depends on run-to-run block partitioning.
# 12 decimals is ~1e4 ulps of slack at cosine~1 while still far below any
# genuine score separation; it also matches the SQL oracle's behavior on
# exact-duplicate embeddings (identical lists -> identical cosine -> vec_id
# order).
_COS_DECIMALS = 12


def _argtopk_tied(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Row-wise indices of the ``kk`` largest sims with DETERMINISTIC ties:
    argpartition keeps an ARBITRARY subset of elements tied at the k-th
    score (duplicate embeddings make exact ties common), which can drop the
    smallest-id winner before the final merge ever sees it.  Rows where the
    tie straddles the selection boundary redo with the exact
    (score DESC, id ASC) order — rare, so the O(n log n) per-row fallback
    never shows up in aggregate.  (``brute_force_topk`` inlines the same
    repair on its negated reused buffer.)"""
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    sel = np.take_along_axis(sims, part, axis=1)
    thr = sel.min(axis=1)  # k-th (worst kept) score
    at_thr_all = (sims == thr[:, None]).sum(axis=1)
    at_thr_sel = (sel == thr[:, None]).sum(axis=1)
    for r in np.flatnonzero(at_thr_all > at_thr_sel):
        part[r] = np.lexsort((ids, -sims[r]))[:kk]
    return part


def brute_force_topk(ds, query_vecs: np.ndarray, query_ids: np.ndarray, k: int = 10):
    """Exact cosine top-k of each query vector over the embedding corpus.

    Returns query_id, rank (1-based), vec_id — deterministic tie-break by
    (cosine DESC, vec_id ASC).  Per-batch partial top-k -> one small merge.
    """
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids, dtype=np.int64)
    n_parts = default_n_parts()

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_vec_matrix(batch))
        ids = batch["vec_id"].to_numpy()
        n_q = len(q)
        kk = min(k, len(ids))
        if kk == 0 or n_q == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        # chunk the query axis so the sims matrix stays ~4 MB regardless of
        # the number of standing queries: that size is served from the
        # reused malloc arena, while tens-of-MB numpy temporaries get
        # mmap'd/munmap'd per chunk and their repeated first-touch page
        # faults can dominate the dgemm itself; one preallocated buffer is
        # reused (out=) across chunks
        q_chunk = max(1, min(n_q, (1 << 19) // max(len(ids), 1)))
        out_v = np.empty((n_q, kk), dtype=np.int64)
        out_s = np.empty((n_q, kk), dtype=np.float64)
        mt = np.ascontiguousarray(m.T)
        sims = np.empty((q_chunk, len(ids)), dtype=np.float64)
        for q0 in range(0, n_q, q_chunk):
            qc = q[q0 : q0 + q_chunk]
            buf = sims[: len(qc)]
            np.matmul(qc, mt, out=buf)
            np.round(buf, _COS_DECIMALS, out=buf)  # cross-block tie stability
            np.negative(buf, out=buf)  # ascending argpartition == cosine desc
            part = np.argpartition(buf, kk - 1, axis=1)[:, :kk]
            # tie repair: argpartition picks an ARBITRARY subset of elements
            # tied at the k-th score (duplicate embeddings make exact ties
            # common), which can drop the smallest-vec_id winner before the
            # final merge ever sees it.  Detect rows where ties straddle the
            # selection boundary and redo just those with the exact
            # (cosine DESC, vec_id ASC) order — rare, so the O(n log n)
            # per-row fallback never shows up in aggregate.
            sel_neg = np.take_along_axis(buf, part, axis=1)
            thr = sel_neg.max(axis=1)  # negated k-th (worst kept) score
            at_thr_all = (buf == thr[:, None]).sum(axis=1)
            at_thr_sel = (sel_neg == thr[:, None]).sum(axis=1)
            for r in np.flatnonzero(at_thr_all > at_thr_sel):
                part[r] = np.lexsort((ids, buf[r]))[:kk]
            out_v[q0 : q0 + q_chunk] = ids[part]
            out_s[q0 : q0 + q_chunk] = -np.take_along_axis(buf, part, axis=1)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, kk)),
                "vec_id": pa.array(out_v.ravel()),
                "cosine": pa.array(out_s.ravel()),
                "part": pa.array(
                    np.repeat((qids % n_parts).astype(np.int32), kk)
                ),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # shared hash-partitioned merge (one vectorized lexsort per partition,
    # never one Ray group per query) — same stage ivf_search finishes with
    return _merge_topk_by_part(partials, k)


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

    n_parts = default_n_parts()

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
            sims = np.round(q[wanting] @ m[mask].T, _COS_DECIMALS)
            sub_ids = ids[mask]
            # flat (query x bucket-member) cross product — no per-row Python
            out_q.append(np.repeat(qids[wanting], len(sub_ids)))
            out_v.append(np.tile(sub_ids, len(wanting)))
            out_s.append(sims.ravel())
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        oq = np.concatenate(out_q)
        return pa.table(
            {
                "query_id": pa.array(oq, type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
                "part": pa.array((oq % n_parts).astype(np.int32)),
            }
        )

    partials = bucketed.map_batches(probe_buckets, batch_format="pyarrow")
    # each corpus vector lives in exactly one bucket, so a (query, vec) pair
    # is emitted at most once across all blocks — the partitioned merge needs
    # no dedup, and one vectorized lexsort per partition replaces the old
    # one-Ray-group-per-query map_groups (~0.5-1 ms dispatch per query)
    return _merge_topk_by_part(partials, k)


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
        # banded rows carry IDS ONLY — 13 bytes/row instead of replicating
        # the embedding vector n_tables times through the shuffle; candidate
        # pairs batch-lookup their vectors afterwards (bounded by the
        # candidate count, not the corpus)
        return pa.table(
            {
                "table": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets), type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, k), type=pa.int64()),
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
    every bucket); banded rows carry ONLY (table, bucket, vec_id) — no
    vector replication through the shuffle.  Candidate pairs come from a
    bounded hash-partitioned vectorized pair stage (oversize buckets emit a
    sliding id-window of width ``bucket_cap``, keeping duplicate runs
    paired without O(B^2) blowup), dedup across tables, then ONE bounded
    batch-lookup of the candidate vectors verifies exact cosine.  Recall
    for cosine>=0.95 with 8 planes x 4 tables is ~0.9 (probabilistic;
    identical vectors are always found)."""
    import ray
    import ray.data as rd

    from .dedup import _add_band_part, _bucket_pair_stage, _dedup_pairs

    empty = pd.DataFrame(
        {"vec_a": pd.Series(dtype=np.int64),
         "vec_b": pd.Series(dtype=np.int64),
         "cosine": pd.Series(dtype=np.float64)}
    )
    head = ds.take(1)
    if not head:  # empty corpus -> the canonical empty frame, not IndexError
        return rd.from_pandas(empty)
    dim = len(head[0]["embedding"])
    bucketed = ds.map_batches(
        _MultiTableLshStage,
        batch_format="pyarrow",
        fn_constructor_args=(dim, n_planes, n_tables, seed),
        concurrency=concurrency,
    )

    n_parts = default_n_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        return _add_band_part(batch, n_parts, band_col="table")

    pairs = (
        bucketed.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            _bucket_pair_stage(
                ("table", "bucket"), bucket_cap, id_col="vec_id",
                window=bucket_cap,
            ),
            batch_format="pandas",
        )
    )
    pairs_pd = _dedup_pairs(pairs).to_pandas()  # bounded by candidate count
    if len(pairs_pd) == 0:
        return rd.from_pandas(empty)

    # verification: one pass over the corpus keeps only candidate vectors
    # (broadcast sorted id filter), then exact cosine per candidate pair
    cand_ids = np.union1d(
        pairs_pd["doc_a"].to_numpy(), pairs_pd["doc_b"].to_numpy()
    )
    cand_ref = ray.put(np.sort(cand_ids))

    def filter_vecs(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        ids = batch["vec_id"].to_numpy()
        idx = np.searchsorted(cand, ids)
        keep = (idx < len(cand)) & (cand[np.clip(idx, 0, len(cand) - 1)] == ids)
        kept = batch.filter(pa.array(keep))
        return kept.select(["vec_id", "embedding"])

    cand_tbl = pa.concat_tables(
        [
            t.combine_chunks()
            for t in ray.get(
                ds.map_batches(filter_vecs, batch_format="pyarrow").to_arrow_refs()
            )
        ],
        promote_options="default",
    )
    mat = _normalize(_vec_matrix(cand_tbl))
    ids = cand_tbl["vec_id"].to_numpy()
    order = np.argsort(ids)
    mat, ids = mat[order], ids[order]
    ia = np.searchsorted(ids, pairs_pd["doc_a"].to_numpy())
    ib = np.searchsorted(ids, pairs_pd["doc_b"].to_numpy())
    cos = np.einsum("ij,ij->i", mat[ia], mat[ib])
    keep = cos >= threshold
    out = pd.DataFrame(
        {
            "vec_a": pairs_pd["doc_a"].to_numpy(np.int64)[keep],
            "vec_b": pairs_pd["doc_b"].to_numpy(np.int64)[keep],
            "cosine": cos[keep].astype(np.float64),
        }
    )
    return rd.from_pandas(out if len(out) else empty)


# -- IVF (inverted-file) ANN — the coarse-quantizer scale path ---------------


def synthesize_clustered_embeddings(
    n: int,
    dim: int = 64,
    n_clusters: int = 64,
    noise: float = 0.15,
    seed: int = 5,
    n_queries: int = 0,
):
    """Deterministic clustered corpus for honest IVF pruning evidence.

    The driver's ``embeddings`` table is uniform random (same-label cosine
    ~= cross-label), where coarse quantization CANNOT prune without recall
    loss — a property of that data, not of the index.  Real embedding
    corpora cluster; this generator reproduces that: unit cluster centers
    + ``noise``-scaled Gaussian offsets, renormalized (noise=0.15 at
    dim=64 gives within-cluster cosine ~0.4 vs cross ~N(0, 0.125) — the
    regime where nprobe=2 of 64 cells scans ~3% of the corpus at ~0.99
    recall@10).  Returns (vecs, labels) and, when ``n_queries`` > 0, also
    (query_vecs, query_labels) drawn from the same mixture."""
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.standard_normal((n_clusters, dim)))
    labels = rng.integers(0, n_clusters, n)
    vecs = _normalize(centers[labels] + noise * rng.standard_normal((n, dim)))
    if not n_queries:
        return vecs, labels
    qlab = rng.integers(0, n_clusters, n_queries)
    qvecs = _normalize(
        centers[qlab] + noise * rng.standard_normal((n_queries, dim))
    )
    return vecs, labels, qvecs, qlab


def _kmeans_fit(sample: np.ndarray, n_centroids: int, seed: int, iters: int = 10):
    """Deterministic spherical k-means on a bounded sample (driver-side
    numpy; the sample is the ONLY thing that materializes — at 100 TB it
    stays a few thousand rows regardless of corpus size)."""
    sn = _normalize(sample)
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(sn))
    cent = sn[rng.choice(len(sn), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sn @ cent.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = sn[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 8,
    train_sample: int = 2048,
    seed: int = 7,
):
    """IVF approximate top-k: train a coarse quantizer on a bounded sample,
    assign every corpus vector to its nearest centroid (one map_batches),
    then search only the ``n_probe`` closest cells per query — one shuffle
    by cell, exact cosine inside probed cells, tiny final merge.  Recall
    grows with n_probe (n_probe == n_centroids -> exact).

    Output schema matches ``brute_force_topk``: query_id, rank, vec_id."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans_fit(smat, n_centroids, seed)
    cent_ref = ray.put(cent)

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    # per-query probe cells (tiny driver-side compute: n_q x n_centroids)
    probe_order = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe_order):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)
    probes_ref = ray.put((qn, qids, cell_to_queries))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_vec_matrix(batch))
        cell = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "cell": pa.array(cell),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    n_parts = default_n_parts()

    def search_cell(g: pd.DataFrame) -> pd.DataFrame:
        q, ids_, c2q = ray.get(probes_ref)
        cell = int(g["cell"].iloc[0])
        q_idx = c2q.get(cell)
        if not q_idx:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=np.int64),
                 "vec_id": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64),
                 "part": pd.Series(dtype=np.int32)}
            )
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        vids = g["vec_id"].to_numpy(np.int64)
        sims = np.round(q[q_idx] @ m.T, _COS_DECIMALS)
        kk = min(k, sims.shape[1])
        part = _argtopk_tied(sims, vids, kk)
        oq = np.repeat(ids_[q_idx], kk)
        return pd.DataFrame(
            {"query_id": oq,
             "vec_id": vids[part].ravel(),
             "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
             "part": (oq % n_parts).astype(np.int32)}
        )

    partials = assigned.groupby("cell").map_groups(search_cell, batch_format="pandas")
    # each vector is assigned to exactly one cell, so a (query, vec) pair is
    # emitted at most once — the shared hash-partitioned merge applies
    # directly (one vectorized lexsort per partition, never one Ray group
    # per query)
    return _merge_topk_by_part(partials, k)


def _merge_topk_by_part(partials, k: int):
    """Hash-partitioned final top-k merge (one vectorized lexsort per
    partition, never one Ray group per query).  Expects columns
    (query_id, vec_id, cosine, part)."""

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].to_numpy()
        vid = g["vec_id"].to_numpy()
        cos = g["cosine"].to_numpy()
        order = np.lexsort((vid, -cos, qid))
        qid, vid = qid[order], vid[order]
        boundary = np.empty(len(qid), dtype=bool)
        if len(qid):
            boundary[0] = True
            boundary[1:] = qid[1:] != qid[:-1]
        starts = np.flatnonzero(boundary)
        gid = np.cumsum(boundary) - 1
        rank = np.arange(len(qid), dtype=np.int64) - starts[gid] + 1
        keep = rank <= k
        return pd.DataFrame(
            {
                "query_id": qid[keep],
                "rank": rank[keep],
                "vec_id": vid[keep],
            }
        )

    return partials.groupby("part").map_groups(final_topk, batch_format="pandas")


class IvfIndex:
    """Handle to a cell-partitioned on-disk IVF index: the trained
    centroids plus the root of a Parquet layout with one ``cell=<c>``
    directory per coarse cell."""

    def __init__(self, path: str, centroids: np.ndarray):
        self.path = path
        self.centroids = centroids

    def cell_paths(self, cells) -> list[str]:
        """Parquet FILES of the given cells (read_parquet takes a list of
        files, not of directories)."""
        import os

        out = []
        for c in cells:
            p = os.path.join(self.path, f"cell={int(c)}")
            if os.path.isdir(p):
                out.extend(
                    os.path.join(p, f)
                    for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")
                )
        return out


def build_ivf_index(
    ds,
    out_dir: str,
    n_centroids: int = 256,
    train_sample: int = 8192,
    seed: int = 7,
):
    """ONE-TIME index build: train the coarse quantizer, assign every
    corpus vector, and write the corpus partitioned by cell.  This is the
    amortization boundary that makes IVF pay: the per-query-batch
    assignment dgemm (n_corpus x n_centroids — as expensive as brute force
    whenever n_queries <= n_centroids) happens once here, and searches
    then PRUNE AT THE READ — only the probed cells' files leave storage.

    ``cell_id`` is stored as a regular column as well (hive partition
    columns are directory-only), so search batches know their cell without
    re-assigning."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans_fit(smat, n_centroids, seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_vec_matrix(batch))
        cell = np.argmax(m @ c.T, axis=1).astype(np.int64)
        batch = batch.append_column("cell", pa.array(cell))
        return batch.append_column("cell_id", pa.array(cell))

    # sort by cell before the partitioned write: without it every (input
    # block x cell) combination becomes its own tiny file (b x c files whose
    # open/footer costs dominate search reads); sorted blocks give each cell
    # O(1) contiguous files.  The sort is a one-time build cost — this IS
    # the single up-front shuffle the index amortizes.
    ds.map_batches(assign, batch_format="pyarrow").sort("cell").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    return IvfIndex(out_dir, cent)


def ivf_search(
    index: IvfIndex,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_probe: int = 8,
):
    """Search a built IVF index: each query probes its ``n_probe`` nearest
    cells; ONLY those cells' Parquet files are read (storage-level
    pruning), scanned blocks run a per-cell dgemm against the queries
    probing that cell, and a hash-partitioned merge yields the final
    top-k.  No shuffle of corpus vectors, no full-corpus scan.

    Output schema matches ``brute_force_topk``: query_id, rank, vec_id."""
    import ray
    import ray.data as rd

    cent = index.centroids
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    n_parts = default_n_parts()
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    needed = np.unique(probe)
    cell_q = {int(c): np.flatnonzero((probe == c).any(axis=1)) for c in needed}
    bc_ref = ray.put((qn, qids, cell_q))

    paths = index.cell_paths(needed)
    if not paths:
        # distinguish "probed cells are empty" (legal, empty result) from a
        # missing/unreadable index root (mistyped path, remote-URI index the
        # driver can't list) — the latter must NOT silently answer zero
        # neighbors for every query
        import os

        has_any_cell = os.path.isdir(index.path) and any(
            d.startswith("cell=") for d in os.listdir(index.path)
        )
        if not has_any_cell:
            raise FileNotFoundError(
                f"IVF index root {index.path!r} has no cell=<c> partitions "
                "visible to this process (missing, mistyped, or a remote "
                "URI this local reader cannot list)"
            )
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                }
            )
        )

    def search_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # zero-row blocks can arrive (even schemaless)
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        q, ids_, c2q = ray.get(bc_ref)
        cells = batch["cell_id"].to_numpy()
        m = _normalize(_vec_matrix(batch))
        vids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        order = np.argsort(cells, kind="stable")
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(cells[order])) + 1, [len(cells)])
        )
        for b in range(len(bounds) - 1):
            sel = order[bounds[b] : bounds[b + 1]]
            if not len(sel):
                continue
            q_idx = c2q.get(int(cells[sel[0]]))
            if q_idx is None:
                continue
            sub = m[sel]
            sims = np.round(q[q_idx] @ sub.T, _COS_DECIMALS)
            kk = min(k, sims.shape[1])
            part = _argtopk_tied(sims, vids[sel], kk)
            out_q.append(np.repeat(ids_[q_idx], kk))
            out_v.append(vids[sel][part].ravel())
            out_s.append(np.take_along_axis(sims, part, axis=1).ravel())
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        oq = np.concatenate(out_q)
        return pa.table(
            {
                "query_id": pa.array(oq),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
                "part": pa.array((oq % n_parts).astype(np.int32)),
            }
        )

    partials = rd.read_parquet(paths).map_batches(
        search_block, batch_format="pyarrow"
    )
    return _merge_topk_by_part(partials, k)
