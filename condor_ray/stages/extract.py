"""Vectorized key extraction from Arrow transcript batches.

Mirrors the reference's one-field key extractors
(bench/.../sources/utils/SyntheticExtractKeyField.java:7-21,
NYCExtractKeyField) — but as Arrow column projections inside ``map_batches``
instead of per-row map functions.  String keys hash with
``java.lang.String.hashCode`` semantics via the vectorized
``java_string_hash_arrow`` kernel, which dictionary-encodes long columns so
only distinct values hash (conv_ids and tool names repeat heavily).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import KeySpec
from ..hashing import java_string_hash_arrow


def ts_to_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 epoch-microsecond ndarray (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy()


class KeyExtractor:
    """Callable: Arrow batch -> int32/float64 key ndarray per KeySpec."""

    def __init__(self, spec: KeySpec):
        self.spec = spec

    def __call__(self, batch: pa.Table) -> np.ndarray:
        col = batch[self.spec.field]
        t = self.spec.transform
        if t == "java_hash":
            return self._hash_strings(col)
        if t == "length":
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.utf8_length(col).cast(pa.int64()).to_numpy().astype(np.int32)
        if t == "value":
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.to_numpy(zero_copy_only=False)
        raise ValueError(f"unknown key transform {t!r}")

    def _hash_strings(self, col) -> np.ndarray:
        # vectorized over the Arrow buffer (nulls hash to 0, documented)
        return java_string_hash_arrow(col)
