"""Iterative graph operators over pair lists (dedup clustering).

A near-dup pipeline emits PAIRS (``dedup.minhash_lsh_pairs``,
``dedup.simhash_pairs``, ``similarity.embedding_neardup_pairs``); turning
pairs into per-document dedup decisions needs the connected components of
the pair graph — near-duplicate similarity is not transitive, so A~B and
B~C chains must collapse into one cluster with one kept representative.

Scale design (100 TB): the pair graph is orders of magnitude smaller than
the corpus (bounded by the verified near-dup rate), but it can still exceed
one machine, so components run as distributed min-label propagation:

- state is a (doc_id, label) dataset, label = smallest doc_id reached;
- one round = hash-partitioned vectorized join of labels into the edge
  list (messages ``dst <- label(src)``) + a partitioned min-reduce —
  NEVER one Ray group per vertex (the per-group-dispatch rule);
- rounds repeat until no label changes (checked with a scalar ``sum``
  aggregate, not a driver materialization); pointer jumping (label-of-
  label messages) keeps the round count logarithmic in component
  diameter, capped by ``max_iters``.

Known trade-off: the static edge list re-enters the groupby exchange
every round (Ray Data's only key-colocation primitive is the sort-based
groupby).  Measured: 5M edges / giant component = 24 rounds, 226 s at 32
CPUs.  The upgrade path for trillion-edge pair graphs is edge-resident
state actors (edges partitioned once, only label deltas move per round)
— the same actor pattern the streaming engine uses for synopsis state.

The reference has no graph surface (its operator algebra is the synopsis
set, SURVEY §2.8); this operator belongs to the training-data additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def connected_components(
    pairs_ds, n_parts: int = 64, max_iters: int = 64, verbose: bool = False
):
    """Connected components of an undirected pair list.

    ``pairs_ds``: dataset with int64 columns ``doc_a``, ``doc_b`` (one row
    per edge; direction and duplicate edges don't matter; ids must be
    non-negative — ``-1`` is the internal label-row sentinel).  Returns a
    dataset (doc_id, component) covering every endpoint, ``component`` =
    the smallest doc_id in the doc's connected component (the canonical
    keep id)."""

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "part": pa.array((src % n_parts).astype(np.int32)),
            }
        )

    import ray

    # bound block counts: each groupby-sort emits one block per input
    # block, and the per-round unions would otherwise COMPOUND the count
    # (~2x/round) until the shuffle scheduler stalls on thousands of tiny
    # blocks — labels are repartitioned back to n_blocks every round
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_blocks = max(2, min(n_parts, ncpu))

    edges = (
        pairs_ds.map_batches(both_dirs, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
    )

    # initial labels: every endpoint labels itself (deduped per partition)
    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        src = np.unique(g["src"].to_numpy())
        return pd.DataFrame({"doc_id": src, "label": src})

    labels = (
        edges.groupby("part")
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )  # columns: exactly (doc_id, label), one row per vertex

    def tag_label_rows(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": pa.array(doc),
                "dst": pa.array(np.full(len(doc), -1, dtype=np.int64)),
                "label": b["label"],
                "part": pa.array((doc % n_parts).astype(np.int32)),
            }
        )

    def tag_edge_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b["src"],
                "dst": b["dst"],
                "label": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
                "part": b["part"],
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        # labels and edges are co-partitioned on src; every edge src has a
        # label row (dst == -1 marks a label row)
        dst_all = g["dst"].to_numpy().astype(np.int64)
        src_all = g["src"].to_numpy().astype(np.int64)
        lab_all = g["label"].to_numpy().astype(np.int64)
        is_label = dst_all == -1
        lab_doc = src_all[is_label]
        lab_val = lab_all[is_label]
        order = np.argsort(lab_doc)
        lab_doc, lab_val = lab_doc[order], lab_val[order]
        src, dst = src_all[~is_label], dst_all[~is_label]
        idx = np.searchsorted(lab_doc, src)
        return pd.DataFrame({"doc_id": dst, "label": lab_val[idx]})

    def tag_old(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "label": b["label"],
                "is_old": pa.array(np.ones(len(doc), dtype=bool)),
                "part": pa.array((doc % n_parts).astype(np.int32)),
            }
        )

    def tag_msg(df: pd.DataFrame) -> pa.Table:
        # Arrow output: the union partner (tag_old) emits Arrow blocks and
        # Ray's sort cannot sample mixed pandas/Arrow block streams
        doc = df["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "label": pa.array(df["label"].to_numpy().astype(np.int64)),
                "is_old": pa.array(np.zeros(len(doc), dtype=bool)),
                "part": pa.array((doc % n_parts).astype(np.int32)),
            }
        )

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        doc_all = g["doc_id"].to_numpy().astype(np.int64)
        lab_all = g["label"].to_numpy().astype(np.int64)
        doc, lab = _min_label_per_doc(doc_all, lab_all)
        is_old = g["is_old"].to_numpy()
        old_doc = doc_all[is_old]
        old_lab = lab_all[is_old]
        order = np.argsort(old_doc)
        # every doc has exactly one old row, so doc == old_doc[order]
        changed = int((lab < old_lab[order]).sum())
        out = pd.DataFrame({"doc_id": doc, "label": lab})
        out["changed"] = 0
        if len(out):
            out.iloc[0, out.columns.get_loc("changed")] = changed
        return out

    def shortcut_edges(b: pa.Table) -> pa.Table:
        # pointer jumping: doc also asks for label(label(doc)) each round —
        # path lengths halve per round, so a depth-D chain converges in
        # O(log D) rounds instead of D (the Ray-job fixed cost per round is
        # what dominates, so round count is the thing to minimize)
        lab = b["label"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": pa.array(lab),
                "dst": b["doc_id"].cast(pa.int64()),
                "label": pa.array(np.full(len(lab), -1, dtype=np.int64)),
                "part": pa.array((lab % n_parts).astype(np.int32)),
            }
        )

    for _ in range(max_iters):
        msgs = (
            labels.map_batches(tag_label_rows, batch_format="pyarrow")
            .union(
                edges.map_batches(tag_edge_rows, batch_format="pyarrow"),
                labels.map_batches(shortcut_edges, batch_format="pyarrow"),
            )
            .groupby("part")
            .map_groups(send, batch_format="pandas")
        )
        new_labels = (
            labels.map_batches(tag_old, batch_format="pyarrow")
            .union(msgs.map_batches(tag_msg, batch_format="pandas"))
            .groupby("part")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        n_changed = new_labels.sum("changed")
        labels = (
            new_labels.drop_columns(["changed"]).repartition(n_blocks).materialize()
        )
        if verbose:
            import sys
            import time

            print(
                f"[components] round changed={n_changed} t={time.strftime('%H:%M:%S')}",
                file=sys.stderr,
                flush=True,
            )
        if not n_changed:
            break

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "component": b["label"]}),
        batch_format="pyarrow",
    )


def dedup_keep_list(docs_ds, pairs_ds, n_parts: int = 64):
    """Per-document dedup decision from a near-dup pair list.

    ``docs_ds`` needs a ``doc_id`` column covering the corpus.  Returns
    (doc_id, component, keep): ``component`` is the smallest doc_id in the
    doc's near-dup cluster (its own id when unpaired), ``keep`` is true for
    exactly one representative (the smallest id) per cluster."""
    comps = connected_components(pairs_ds, n_parts=n_parts).materialize()

    def tag_docs(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "component": pa.array(doc),  # default: own cluster
                "part": pa.array((doc % n_parts).astype(np.int32)),
            }
        )

    def tag_comps(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "component": batch["component"],
                "part": pa.array((doc % n_parts).astype(np.int32)),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        doc, comp = _min_label_per_doc(
            g["doc_id"].to_numpy().astype(np.int64),
            g["component"].to_numpy().astype(np.int64),
        )
        return pd.DataFrame(
            {"doc_id": doc, "component": comp, "keep": doc == comp}
        )

    return (
        docs_ds.map_batches(tag_docs, batch_format="pyarrow")
        .union(comps.map_batches(tag_comps, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(resolve, batch_format="pandas")
    )
