"""Build configuration, mirroring Condor's ``BuildConfiguration``
(conn/.../processor/configs/BuildConfiguration.java:18-91): synopsis class +
params, window definitions, optional stratification, parallelism."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from .windows import Window


@dataclass
class KeySpec:
    """How to derive the synopsis input from a transcripts batch.

    field: column name; transform:
      - "java_hash": java String.hashCode of the string column (int32 universe,
        mirrors the reference's Number.intValue()/hashCode keying)
      - "length":    UTF-8 length of the string column (numeric domain)
      - "value":     numeric column used as-is (cast to the kernel's dtype)
    """

    field: str = "conv_id"
    transform: str = "java_hash"


@dataclass
class BuildConfiguration:
    synopsis: str = "CountMinSketch"  # registry name
    params: tuple = (65536, 5, 7)  # reference standard CM{65536,5,7}
    windows: Sequence[Window] = field(default_factory=tuple)
    key: KeySpec = field(default_factory=KeySpec)
    stratify_by: str | None = None  # column name (e.g. "role"), or None
    parallelism: int = 8  # streaming partitions P (hash(conv_id) % P)
    sample_elements: bool = False  # samplers: element=(conv_id,turn_idx) tuple
    late_policy: str = "drop"  # reference drops late rows (watermark = max ts)
    hot_key_threshold: int | None = None  # rows/window above which keys are salted
