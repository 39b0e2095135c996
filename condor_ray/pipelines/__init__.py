from .core import (
    flagship_hll_pipeline,
    windowed_distinct_convs,
    cm_tool_frequencies,
)

__all__ = [
    "flagship_hll_pipeline",
    "windowed_distinct_convs",
    "cm_tool_frequencies",
]
