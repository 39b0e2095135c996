"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in condor_ray) calls
``ray.init`` / ``ray.shutdown``.  Each ``queries()[name](sf_dir)`` pairs with
``oracle_sql()[name]`` run by DuckDB over the same parquet tables; column
names/aliases match exactly (the driver sorts columns by name and hashes
values).  Synopsis pipelines whose outputs are estimates (not SQL-expressible)
omit the oracle and get the weaker rows-only check.

The engine's primary input shape is the transcripts table (BASELINE
input_hint).  Driver tables carry no transcripts, so the ``events`` table is
deterministically adapted to transcripts shape on BOTH sides (Ray:
condor_ray.sources.events_adapter; SQL: the same derivation as a CTE) — every
windowed result downstream is therefore checkable end-to-end, including
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

WINDOW_MS = 6 * 3600 * 1000  # 6 h tumbling over the ~30-day events span
_W_US = WINDOW_MS * 1000

_TRANSCRIPTS_CTE = None


def _transcripts_cte() -> str:
    global _TRANSCRIPTS_CTE
    if _TRANSCRIPTS_CTE is None:
        from condor_ray.sources.events_adapter import TRANSCRIPTS_FROM_EVENTS_SQL

        _TRANSCRIPTS_CTE = f"WITH transcripts AS (\n{TRANSCRIPTS_FROM_EVENTS_SQL}\n)"
    return _TRANSCRIPTS_CTE


def entry() -> Any:
    """Flagship pipeline on sf0.001: HLL-per-window distinct conversations."""
    from condor_ray.pipelines.core import flagship_hll_pipeline
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events("/root/testdata/sf0.001")
    return flagship_hll_pipeline(ds, TumblingWindow(WINDOW_MS))


def _q_transcripts(sf_dir: str):
    from condor_ray.sources.events_adapter import transcripts_from_events

    return transcripts_from_events(sf_dir)


def _q_windowed_counts(sf_dir: str):
    from condor_ray.engine.batch import windowed_counts
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_counts(ds, TumblingWindow(WINDOW_MS))


def _q_windowed_counts_by_role(sf_dir: str):
    from condor_ray.engine.batch import windowed_counts
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_counts(ds, TumblingWindow(WINDOW_MS), stratify_by="role")


def _q_windowed_distinct(sf_dir: str):
    from condor_ray.pipelines.core import windowed_distinct_convs
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return windowed_distinct_convs(ds, TumblingWindow(WINDOW_MS))


def _q_cm_tool_frequencies(sf_dir: str):
    from condor_ray.pipelines.core import cm_tool_frequencies
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return cm_tool_frequencies(ds, TumblingWindow(WINDOW_MS))


def _q_flagship_hll(sf_dir: str):
    from condor_ray.pipelines.core import flagship_hll_pipeline
    from condor_ray.sources.events_adapter import transcripts_from_events
    from condor_ray.windows import TumblingWindow

    ds = transcripts_from_events(sf_dir)
    return flagship_hll_pipeline(ds, TumblingWindow(WINDOW_MS))


def _q_streaming_windowed_counts(sf_dir: str):
    from condor_ray.pipelines.core import streaming_windowed_counts
    from condor_ray.windows import TumblingWindow

    return streaming_windowed_counts(sf_dir, TumblingWindow(WINDOW_MS))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts_derivation": _q_transcripts,
        "windowed_counts": _q_windowed_counts,
        "windowed_counts_by_role": _q_windowed_counts_by_role,
        "windowed_distinct_convs": _q_windowed_distinct,
        "cm_tool_frequencies": _q_cm_tool_frequencies,
        "flagship_hll": _q_flagship_hll,  # rows-only (estimates)
        "streaming_windowed_counts": _q_streaming_windowed_counts,
    }


def oracle_sql() -> dict[str, str]:
    cte = _transcripts_cte()
    return {
        "transcripts_derivation": f"{cte} SELECT * FROM transcripts",
        "windowed_counts": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       (epoch_us(ts) // {_W_US}) * {_W_US} + {_W_US} AS window_end,
       count(*) AS n_rows
FROM transcripts GROUP BY 1, 2""",
        "windowed_counts_by_role": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       (epoch_us(ts) // {_W_US}) * {_W_US} + {_W_US} AS window_end,
       role AS stratum,
       count(*) AS n_rows
FROM transcripts GROUP BY 1, 2, 3""",
        "streaming_windowed_counts": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       (epoch_us(ts) // {_W_US}) * {_W_US} + {_W_US} AS window_end,
       count(*) AS n_rows
FROM transcripts GROUP BY 1, 2""",
        "windowed_distinct_convs": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       count(DISTINCT conv_id) AS n_convs
FROM transcripts GROUP BY 1""",
        "cm_tool_frequencies": f"""{cte}
SELECT (epoch_us(ts) // {_W_US}) * {_W_US} AS window_start,
       tool,
       count(*) AS est
FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2""",
    }
