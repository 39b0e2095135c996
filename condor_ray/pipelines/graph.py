"""Iterative graph operators over pair lists (dedup clustering).

A near-dup pipeline emits PAIRS (``dedup.minhash_lsh_pairs``,
``dedup.simhash_pairs``, ``similarity.embedding_neardup_pairs``); turning
pairs into per-document dedup decisions needs the connected components of
the pair graph — near-duplicate similarity is not transitive, so A~B and
B~C chains must collapse into one cluster with one kept representative.

Scale design (100 TB): the pair graph is orders of magnitude smaller than
the corpus (bounded by the verified near-dup rate), but it can still exceed
one machine, so components run as distributed min-label propagation over
EDGE-RESIDENT STATE ACTORS (the same pattern the streaming engine uses for
synopsis state):

- edges are hash-partitioned by ``src % P`` ONCE at load (each undirected
  pair enters in both directions, so every vertex's out-edges live on its
  owner partition ``v % P``); each actor keeps its edge CSR and the labels
  of its owned vertices in process memory — the static edge list NEVER
  re-enters a shuffle (the round-3 Ray Data `groupby` formulation paid a
  full edge exchange per round: 24 rounds x 5M edges = 226 s);
- one round = two bounded actor-to-actor exchanges (``num_returns=P``
  shards through the object store, never via the driver):
  (a) pointer-jump requests ``(L[v], v)`` to the owner of ``L[v]`` — path
  lengths in the pointer forest halve per round;
  (b) min-label messages ``(dst, L[src])`` for static edges + jump replies
  + HOOKS, min-combined per (shard, dst) BEFORE sending, so wire traffic
  is bounded by the number of distinct receiving vertices, not the edge
  count;
- HOOKING (Shiloach-Vishkin): when a vertex's label improves, its OLD
  root is notified ``(old_label, new_label)`` next round, so the old
  basin re-roots wholesale instead of learning the better label one
  edge-hop at a time — without this, jump+edge propagation alone needs
  ~n/2 rounds on a random-id chain (measured 1609 rounds for a 4000-doc
  chain; with hooks: 24);
- DELTA PROPAGATION: a static edge re-sends only when its src label
  changed this round (min-label flow is monotone, so a once-delivered
  value never needs re-sending) — after round 1 the per-round edge work
  collapses to the shrinking frontier;
- rounds repeat until a scalar per-actor changed-count sums to zero.

Memory bound per actor: 24 B x E/P for the edge CSR + 16 B x V/P labels;
pick ``n_parts`` ~ total cores so a trillion-edge graph spreads across the
cluster.

The reference has no graph surface (its operator algebra is the synopsis
set, SURVEY §2.8); this operator belongs to the training-data additions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _min_label_per_doc(doc: np.ndarray, lab: np.ndarray):
    """(sorted-unique doc ids, min label per doc) — vectorized."""
    order = np.lexsort((lab, doc))
    doc, lab = doc[order], lab[order]
    boundary = np.empty(len(doc), dtype=bool)
    if len(doc):
        boundary[0] = True
        boundary[1:] = doc[1:] != doc[:-1]
    keep = np.flatnonzero(boundary)
    return doc[keep], lab[keep]


def _shard(keys: np.ndarray, n_parts: int, *cols: np.ndarray):
    """Split ``cols`` into ``n_parts`` tuples by ``keys % n_parts`` with one
    stable sort (contiguous slices, no per-shard boolean scans)."""
    shard = keys % n_parts
    order = np.argsort(shard, kind="stable")
    sorted_shard = shard[order]
    bounds = np.searchsorted(sorted_shard, np.arange(n_parts + 1))
    moved = [c[order] for c in cols]
    return [
        tuple(c[bounds[q] : bounds[q + 1]] for c in moved) for q in range(n_parts)
    ]


def _min_per_key(key: np.ndarray, val: np.ndarray):
    """(unique keys, min val per key) — one lexsort."""
    return _min_label_per_doc(key, val)


class _EdgePartition:
    """Owns vertices with ``id % P == p`` and all their out-edges."""

    def __init__(self, part: int, n_parts: int):
        self.p = part
        self.P = n_parts
        self._src_chunks: list[np.ndarray] = []
        self._dst_chunks: list[np.ndarray] = []

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._src_chunks.append(src)
        self._dst_chunks.append(dst)

    def finalize(self) -> int:
        src = (
            np.concatenate(self._src_chunks)
            if self._src_chunks
            else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_chunks)
            if self._dst_chunks
            else np.empty(0, np.int64)
        )
        self._src_chunks = self._dst_chunks = []  # free ingest buffers
        # own = sorted unique local vertices; edges become a CSR over the
        # owned-vertex index so the per-round label gather is a fancy index
        self.own, inv = np.unique(src, return_inverse=True)
        self.lab = self.own.copy()
        order = np.argsort(inv, kind="stable")
        self.e_dst = dst[order]
        counts = np.bincount(inv, minlength=len(self.own))
        self.e_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        self.changed = np.ones(len(self.own), dtype=bool)  # round 0: send all
        # hooks from the previous reduce: (old root, improved label) pairs
        self.hook_dst = np.empty(0, np.int64)
        self.hook_lab = np.empty(0, np.int64)
        return len(self.own)

    def shortcuts(self):
        """Pointer-jump requests (L[v], v), sharded to the owner of L[v]."""
        return _shard(self.lab, self.P, self.lab, self.own)

    def messages(self, *jump_shards):
        """Static-edge messages for changed sources + jump replies, sharded
        by dst owner and min-combined per dst before sending."""
        # jump replies: request (lab, v) -> message (v, L_local[lab])
        req_lab = np.concatenate([s[0] for s in jump_shards])
        req_v = np.concatenate([s[1] for s in jump_shards])
        idx = np.searchsorted(self.own, req_lab)
        jump_lab = self.lab[idx]

        # static edges whose src label changed this round
        ch = np.flatnonzero(self.changed)
        counts = self.e_off[ch + 1] - self.e_off[ch]
        total = int(counts.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts[:-1]))) if len(counts) else
            np.empty(0, np.int64),
            counts,
        )
        e_idx = np.repeat(self.e_off[ch], counts) + pos
        e_dst = self.e_dst[e_idx]
        e_lab = np.repeat(self.lab[ch], counts)

        dst = np.concatenate([req_v, e_dst, self.hook_dst])
        lab = np.concatenate([jump_lab, e_lab, self.hook_lab])
        self.hook_dst = self.hook_lab = np.empty(0, np.int64)
        dst, lab = _min_per_key(dst, lab)  # combine before the wire
        return _shard(dst, self.P, dst, lab)

    def reduce(self, *msg_shards) -> int:
        """Apply min over incoming labels; returns the changed count."""
        dst = np.concatenate([s[0] for s in msg_shards])
        lab = np.concatenate([s[1] for s in msg_shards])
        dst, lab = _min_per_key(dst, lab)
        idx = np.searchsorted(self.own, dst)
        better = lab < self.lab[idx]
        self.changed = np.zeros(len(self.own), dtype=bool)
        self.changed[idx[better]] = True
        # hook: tell each improved vertex's OLD root about the new label so
        # its whole basin re-roots next round (self-hooks drop: old == own)
        old_root = self.lab[idx[better]]
        new_lab = lab[better]
        real = old_root != dst[better]
        self.hook_dst, self.hook_lab = _min_per_key(
            np.concatenate([self.hook_dst, old_root[real]]),
            np.concatenate([self.hook_lab, new_lab[real]]),
        )
        self.lab[idx[better]] = lab[better]
        return int(better.sum())

    def result(self) -> pa.Table:
        return pa.table({"doc_id": pa.array(self.own), "label": pa.array(self.lab)})


def connected_components(
    pairs_ds, n_parts: int = 32, max_iters: int = 64, verbose: bool = False
):
    """Connected components of an undirected pair list.

    ``pairs_ds``: dataset with int64 columns ``doc_a``, ``doc_b`` (one row
    per edge; direction and duplicate edges don't matter; ids must be
    non-negative).  Returns a dataset (doc_id, component) covering every
    endpoint, ``component`` = the smallest doc_id in the doc's connected
    component (the canonical keep id)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    P = max(2, min(n_parts, ncpu))

    # num_cpus=0: the partitions are memory-resident state whose compute
    # comes in short synchronized bursts; reserving a full CPU per actor
    # would starve the ingest map_batches tasks (P == ncpu -> deadlock, the
    # recurring actor-pool rule).  On a multi-node cluster Ray still
    # SPREAD-schedules them across nodes by memory pressure.
    Part = ray.remote(num_cpus=0)(_EdgePartition)
    actors = [Part.remote(p, P) for p in range(P)]

    # one pass over the pair blocks: both directions, sharded by src owner,
    # pushed straight into the actors (no sort-based groupby at load)
    def ingest(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.schema.names:
            # zero-row blocks can arrive schemaless (no columns at all)
            return pa.table({"n": pa.array([0], type=pa.int64())})
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        acks = [
            actors[q].add_edges.remote(s, d)
            for q, (s, d) in enumerate(_shard(src, P, src, dst))
            if len(s)
        ]
        ray.get(acks)  # delivered before the load pass is declared done
        return pa.table({"n": pa.array([len(src)], type=pa.int64())})

    pairs_ds.map_batches(ingest, batch_format="pyarrow").sum("n")
    ray.get([a.finalize.remote() for a in actors])

    for it in range(max_iters):
        jump = [a.shortcuts.options(num_returns=P).remote() for a in actors]
        msgs = [
            actors[p].messages.options(num_returns=P).remote(
                *[jump[q][p] for q in range(P)]
            )
            for p in range(P)
        ]
        changed = sum(
            ray.get(
                [
                    actors[p].reduce.remote(*[msgs[q][p] for q in range(P)])
                    for p in range(P)
                ]
            )
        )
        if verbose:
            import sys
            import time

            print(
                f"[components] round {it} changed={changed}"
                f" t={time.strftime('%H:%M:%S')}",
                file=sys.stderr,
                flush=True,
            )
        if not changed:
            break
    else:
        # silent non-convergence would emit WRONG components (multiple keeps
        # per cluster); with hooking the round count is O(log n) — measured
        # 27 rounds for a 20k-vertex chain — so hitting this means either a
        # pathological graph or a bug, and the caller must know
        for a in actors:
            ray.kill(a)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters"
        )

    import ray.data as rd

    out = rd.from_arrow_refs([a.result.remote() for a in actors])
    labels = out.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "component": b["label"]}),
        batch_format="pyarrow",
    ).materialize()
    for a in actors:
        ray.kill(a)
    return labels


def dedup_keep_list(docs_ds, pairs_ds, n_parts: int = 32):
    """Per-document dedup decision from a near-dup pair list.

    ``docs_ds`` needs a ``doc_id`` column covering the corpus.  Returns
    (doc_id, component, keep): ``component`` is the smallest doc_id in the
    doc's near-dup cluster (its own id when unpaired), ``keep`` is true for
    exactly one representative (the smallest id) per cluster."""
    comps = connected_components(pairs_ds, n_parts=n_parts)

    from ..engine.exchange import hash_exchange, split_by_partition

    pair_schema = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])

    def tag_docs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.schema.names:
            return pair_schema.empty_table()
        doc = batch["doc_id"].to_numpy().astype(np.int64)
        # default: own cluster (overridden by a comps row via the min)
        return pa.table({"doc_id": pa.array(doc), "component": pa.array(doc)})

    def tag_comps(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.schema.names:
            return pair_schema.empty_table()
        return pa.table(
            {"doc_id": batch["doc_id"], "component": batch["component"]}
        ).cast(pair_schema)

    # one task-exchange pass sharded by doc_id owner (the same antidote to
    # the sort-based groupby("part") every other full-row conquer uses —
    # this was the dedup family's last range-sampled sort over a
    # corpus-sized stream)
    def shard(block, n_buckets: int):
        if block.num_rows == 0 or "doc_id" not in block.schema.names:
            return tuple(pair_schema.empty_table() for _ in range(n_buckets))
        doc = block["doc_id"].to_numpy()
        return split_by_partition(
            block.combine_chunks(), doc % n_buckets, n_buckets
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("component", pa.int64()), ("keep", pa.bool_())]
    )

    def resolve(*tables):
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return out_schema.empty_table()
        cat = pa.concat_tables(tables)
        doc, comp = _min_label_per_doc(
            cat["doc_id"].to_numpy(), cat["component"].to_numpy()
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "component": pa.array(comp),
                "keep": pa.array(doc == comp),
            }
        )

    stream = docs_ds.map_batches(tag_docs, batch_format="pyarrow").union(
        comps.map_batches(tag_comps, batch_format="pyarrow")
    )
    return hash_exchange(stream, n_parts, shard, resolve)
