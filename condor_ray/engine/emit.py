"""Shared async exactly-once sink for the streaming driver loops.

One Ray task per close cycle: concat the state stores' emission tables,
canonically sort, write to a temp file, atomically rename.  Replayed
fragments rewrite byte-identical files (idempotent), and the driver loop
never blocks on emission I/O — it drains outstanding emit futures before
writing a checkpoint so resume never skips an un-emitted fragment.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote
def atomic_emit(out_dir: str, prefix: str, idx: int,
                sort_keys: list[tuple[str, str]] | None, *tables) -> int:
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return 0
    out = pa.concat_tables(tables)
    if sort_keys:
        out = out.sort_by(sort_keys)
    path = os.path.join(out_dir, f"{prefix}-f{idx:05d}.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return out.num_rows
