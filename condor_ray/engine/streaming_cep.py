"""Streaming CEP: strict-contiguity pattern matching under watermarks.

Runs :mod:`condor_ray.pipelines.cep`'s matcher incrementally over the
micro-batch fragment stream with the same mechanics as the other streaming
jobs (hash-partitioned state actors, watermark-driven emission, atomic
exactly-once sink files, lineage manifest, checkpoint/resume).

Incremental contract (why emissions equal the batch operator's):

- A row is STABLE once ``ts < watermark`` — no earlier row can still arrive
  (arrivals with ``ts < carry-in watermark`` are late and dropped/counted).
- Each close cycle matches over ``tail + newly-stable rows`` of each pending
  conversation, where ``tail`` is the conversation's last ``k-1`` stable rows.
  Every k-row window in that span contains at least one newly-stable row
  (the tail holds only k-1), so no match is emitted twice; and a window
  reaching further back would span more than k consecutive rows, so no match
  is missed.  State per conversation is O(k + in-flight rows), bounded by
  the watermark lag — independent of stream length.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..hashing import java_string_hash_arrow
from ..pipelines.cep import Step, find_match_starts, matches_frame
from ..stages.extract import ts_to_us
from .streaming import _NEG_INF, _murmur_mix_array

_FAR_FUTURE = 2**62

_EMIT_SCHEMA = {
    "conv_id": pa.string(),
    "start_turn_idx": pa.int64(),
    "end_turn_idx": pa.int64(),
    "start_ts": pa.int64(),
    "end_ts": pa.int64(),
}


def _partition_cep_fragment(
    path: str,
    parallelism: int,
    watermark_us: int,
    columns: list[str] | None,
):
    """Split one fragment into P shards by conv hash; drop late rows
    (``ts < carry-in watermark`` — positions before the watermark are already
    finalized and matched)."""
    table = pq.read_table(path, columns=columns)
    n = table.num_rows
    ts = ts_to_us(table["ts"])
    frag_max = int(ts.max()) if n else _NEG_INF
    late = ts < watermark_us
    n_late = int(late.sum())
    if n_late:
        table = table.filter(pa.array(~late))
    conv = table["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    dic = conv.dictionary_encode()
    hashes = java_string_hash_arrow(dic.dictionary)
    lut = _murmur_mix_array(hashes) % parallelism
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    part = lut[codes]
    order = np.argsort(part, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    counts = np.bincount(part, minlength=parallelism)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    shards = [sorted_tbl.slice(offsets[p], counts[p]) for p in range(parallelism)]
    meta = {"n_rows": n, "n_late": n_late, "frag_max_ts": frag_max}
    return (meta, *shards)


@ray.remote(num_cpus=0.5)
class PatternStateStore:
    """Per-partition CEP state: conv -> (k-1 stable tail, pending rows)."""

    def __init__(self, partition_id: int, steps: list[Step],
                 within_us: int | None):
        self.partition_id = partition_id
        self.steps = list(steps)
        self.k = len(steps)
        self.within_us = within_us
        self.cols = sorted({s.col for s in steps})
        # conv -> list of (ts_arr, turn_arr, {col: arr}) chunks, arrival order
        self.pending: dict[str, list] = {}
        # conv -> (ts_arr, turn_arr, {col: arr}) of the last k-1 stable rows
        self.tails: dict[str, tuple] = {}
        self.rows_ingested = 0
        self.peak_pending_rows = 0

    def ingest(self, batch: pa.Table) -> int:
        n = batch.num_rows
        if n == 0:
            return 0
        ts = ts_to_us(batch["ts"])
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        col_arrs = {
            c: batch[c].to_numpy(zero_copy_only=False) for c in self.cols
        }
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        dic = conv.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        convs = dic.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(codes_s))[0] + 1, [n]]
        )
        for b in range(len(bounds) - 1):
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            sel = order[lo:hi]
            cid = convs[int(codes_s[lo])]
            self.pending.setdefault(cid, []).append(
                (ts[sel], turn[sel], {c: a[sel] for c, a in col_arrs.items()})
            )
        self.rows_ingested += n
        return n

    def _concat(self, chunks: list) -> tuple:
        if len(chunks) == 1:
            return chunks[0]
        return (
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
            {
                c: np.concatenate([ch[2][c] for ch in chunks])
                for c in self.cols
            },
        )

    def close(self, watermark_us: int) -> pa.Table:
        """Match + emit over rows that became stable (ts < watermark)."""
        out: list[pd.DataFrame] = []
        n_pending = 0
        for cid in list(self.pending):
            ts, turn, cols = self._concat(self.pending[cid])
            order = np.lexsort((turn, ts))
            ts, turn = ts[order], turn[order]
            cols = {c: a[order] for c, a in cols.items()}
            n_stable = int(np.searchsorted(ts, watermark_us, side="left"))
            if n_stable == 0:
                self.pending[cid] = [(ts, turn, cols)]
                n_pending += len(ts)
                continue
            tail = self.tails.get(cid)
            if tail is not None:
                c_ts = np.concatenate([tail[0], ts[:n_stable]])
                c_turn = np.concatenate([tail[1], turn[:n_stable]])
                c_cols = {
                    c: np.concatenate([tail[2][c], cols[c][:n_stable]])
                    for c in self.cols
                }
            else:
                c_ts, c_turn = ts[:n_stable], turn[:n_stable]
                c_cols = {c: a[:n_stable] for c, a in cols.items()}
            starts = find_match_starts(
                np.zeros(len(c_ts), dtype=np.int8),
                c_ts,
                c_cols,
                self.steps,
                self.within_us,
            )
            if len(starts):
                conv_arr = np.full(len(c_ts), cid, dtype=object)
                out.append(
                    matches_frame(conv_arr, c_ts, c_turn, starts, self.k)
                )
            keep = self.k - 1
            if keep > 0:
                self.tails[cid] = (
                    c_ts[-keep:],
                    c_turn[-keep:],
                    {c: a[-keep:] for c, a in c_cols.items()},
                )
            if n_stable < len(ts):
                self.pending[cid] = [
                    (
                        ts[n_stable:],
                        turn[n_stable:],
                        {c: a[n_stable:] for c, a in cols.items()},
                    )
                ]
                n_pending += len(ts) - n_stable
            else:
                del self.pending[cid]
        self.peak_pending_rows = max(self.peak_pending_rows, n_pending)
        if not out:
            return pa.table(
                {k: pa.array([], type=t) for k, t in _EMIT_SCHEMA.items()}
            )
        df = pd.concat(out, ignore_index=True)
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"], type=pa.string()),
                "start_turn_idx": pa.array(df["start_turn_idx"], type=pa.int64()),
                "end_turn_idx": pa.array(df["end_turn_idx"], type=pa.int64()),
                "start_ts": pa.array(df["start_ts"], type=pa.int64()),
                "end_ts": pa.array(df["end_ts"], type=pa.int64()),
            }
        )

    def stats(self) -> dict:
        return {
            "rows_ingested": self.rows_ingested,
            "peak_pending_rows": self.peak_pending_rows,
            "open_tails": len(self.tails),
        }

    # -- checkpoint ---------------------------------------------------------
    def snapshot(self) -> bytes:
        import pickle

        return pickle.dumps(
            {
                "pending": {
                    cid: self._concat(chunks)
                    for cid, chunks in self.pending.items()
                },
                "tails": self.tails,
                "rows_ingested": self.rows_ingested,
                "peak_pending_rows": self.peak_pending_rows,
            },
            protocol=4,
        )

    def restore(self, blob: bytes) -> None:
        import pickle

        st = pickle.loads(blob)
        self.pending = {cid: [chunk] for cid, chunk in st["pending"].items()}
        self.tails = dict(st["tails"])
        self.rows_ingested = st["rows_ingested"]
        self.peak_pending_rows = st["peak_pending_rows"]


class StreamingPatternJob:
    """Micro-batch CEP job over ts-ordered Parquet fragments with watermarks,
    exactly-once emission, and checkpoint/resume (same lineage mechanics as
    the other streaming jobs)."""

    def __init__(
        self,
        steps: list[Step],
        out_dir: str,
        within_ms: int | None = None,
        parallelism: int = 4,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 4,
        columns: list[str] | None = None,
    ):
        if not steps:
            raise ValueError("pattern needs at least one step")
        self.steps = list(steps)
        self.within_us = within_ms * 1000 if within_ms is not None else None
        self.parallelism = parallelism
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        need = {"conv_id", "turn_idx", "ts"} | {s.col for s in steps}
        self.columns = sorted(need) if columns is None else columns
        os.makedirs(out_dir, exist_ok=True)
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        self.stores = [
            PatternStateStore.remote(p, self.steps, self.within_us)
            for p in range(parallelism)
        ]
        self.watermark = _NEG_INF
        self.next_fragment = 0
        self.total_late = 0
        self.total_rows = 0

    def _checkpoint(self) -> None:
        if not self.checkpoint_dir:
            return
        import shutil

        snaps = ray.get([s.snapshot.remote() for s in self.stores])
        tmp = os.path.join(self.checkpoint_dir, f".tmp-ckpt-{self.next_fragment:05d}")
        final = os.path.join(self.checkpoint_dir, f"ckpt-{self.next_fragment:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for p, blob in enumerate(snaps):
            with open(os.path.join(tmp, f"part-{p:04d}.bin"), "wb") as f:
                f.write(blob)
        meta = {
            "next_fragment": self.next_fragment,
            "watermark": self.watermark,
            "total_late": self.total_late,
            "total_rows": self.total_rows,
            "parallelism": self.parallelism,
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def resume(self) -> bool:
        if not self.checkpoint_dir:
            return False
        ckpts = sorted(
            d for d in os.listdir(self.checkpoint_dir) if d.startswith("ckpt-")
        )
        if not ckpts:
            return False
        path = os.path.join(self.checkpoint_dir, ckpts[-1])
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta["parallelism"] != self.parallelism:
            raise ValueError("cannot resume with a different parallelism")
        futs = []
        for p, store in enumerate(self.stores):
            with open(os.path.join(path, f"part-{p:04d}.bin"), "rb") as f:
                futs.append(store.restore.remote(f.read()))
        ray.get(futs)
        self.next_fragment = meta["next_fragment"]
        self.watermark = meta["watermark"]
        self.total_late = meta["total_late"]
        self.total_rows = meta["total_rows"]
        return True

    def _close(self, fragment_idx: int, watermark_us: int) -> int:
        tables = ray.get(
            [s.close.remote(watermark_us) for s in self.stores]
        )
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return 0
        out = pa.concat_tables(tables).sort_by(
            [
                ("conv_id", "ascending"),
                ("start_ts", "ascending"),
                ("start_turn_idx", "ascending"),
            ]
        )
        emit_path = os.path.join(self.out_dir, f"emit-f{fragment_idx:05d}.parquet")
        tmp = emit_path + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, emit_path)
        return out.num_rows

    def run(self, fragment_paths: list[str], resume: bool = False,
            final_flush: bool = True) -> dict:
        if resume:
            self.resume()
        manifest_path = os.path.join(self.out_dir, "manifest.jsonl")
        split = ray.remote(num_returns=1 + self.parallelism)(
            _partition_cep_fragment
        )
        emitted = 0
        for k in range(self.next_fragment, len(fragment_paths)):
            path = fragment_paths[k]
            refs = split.remote(
                path, self.parallelism, self.watermark, self.columns
            )
            meta_ref, shard_refs = refs[0], refs[1:]
            futs = [
                store.ingest.remote(shard)
                for store, shard in zip(self.stores, shard_refs)
            ]
            meta = ray.get(meta_ref)
            ray.get(futs)
            self.total_rows += meta["n_rows"]
            self.total_late += meta["n_late"]
            self.watermark = max(self.watermark, meta["frag_max_ts"])
            emitted += self._close(k, self.watermark)
            with open(manifest_path, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "fragment": k,
                            "path": os.path.basename(path),
                            "rows": meta["n_rows"],
                            "late_dropped": meta["n_late"],
                            "watermark": self.watermark,
                        }
                    )
                    + "\n"
                )
            self.next_fragment = k + 1
            if self.checkpoint_dir and self.next_fragment % self.checkpoint_every == 0:
                self._checkpoint()
        if final_flush and self.watermark > _NEG_INF:
            emitted += self._close(len(fragment_paths), _FAR_FUTURE)
        stats = ray.get([s.stats.remote() for s in self.stores])
        with open(manifest_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "summary": True,
                        "matches_emitted": emitted,
                        "rows": self.total_rows,
                        "late_dropped": self.total_late,
                        "peak_pending_rows": max(
                            (s["peak_pending_rows"] for s in stats), default=0
                        ),
                    }
                )
                + "\n"
            )
        return {
            "rows": self.total_rows,
            "late_dropped": self.total_late,
            "fragments": self.next_fragment,
            "matches_emitted": emitted,
        }

    def result_dataset(self):
        import ray.data as rd

        files = sorted(
            os.path.join(self.out_dir, f)
            for f in os.listdir(self.out_dir)
            if f.startswith("emit-") and f.endswith(".parquet")
        )
        if not files:
            return rd.from_arrow(
                pa.table({k: pa.array([], type=t) for k, t in _EMIT_SCHEMA.items()})
            )
        return rd.read_parquet(files)

    def shutdown(self) -> None:
        for s in self.stores:
            ray.kill(s)
        self.stores = []
