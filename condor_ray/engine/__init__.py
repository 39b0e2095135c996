from .batch import (
    PartialSynopsisBuilder,
    build_windowed_synopses,
    windowed_counts,
)

__all__ = ["PartialSynopsisBuilder", "build_windowed_synopses", "windowed_counts"]
