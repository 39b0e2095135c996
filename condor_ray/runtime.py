"""Worker-process runtime knobs.

The one that matters: polars sizes its global rayon pool to ALL visible
cores at first import.  Inside a Ray worker that oversubscribes the node by
roughly (concurrent workers) x (cores) threads — measured 2.3x wall-time
inflation on the MinHash dedup pipeline at 32 CPUs (16 actors each spinning
a 32-thread pool).  Ray exports ``OMP_NUM_THREADS`` = the task's assigned
``num_cpus`` (default 1) into every worker before user code runs; mirroring
it into ``POLARS_MAX_THREADS`` before the first polars import keeps each
worker's pool sized to its actual CPU share.
"""

from __future__ import annotations

import os
import sys


def default_n_parts(minimum: int = 64) -> int:
    """Hash-partition count for bounded-group conquer stages (the
    per-group-dispatch rule): ~2 groups per cluster core so the conquer
    step keeps scaling past ``minimum`` cores, and each group's in-memory
    frame shrinks as the cluster grows instead of staying 1/64 of the
    shuffle."""
    try:
        import ray

        if ray.is_initialized():
            return max(minimum, 2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return minimum


def worker_polars():
    """Import polars with its thread pool capped to this worker's CPU share.

    Must be used (instead of a bare ``import polars``) by every function or
    actor that runs inside Ray workers.  No-op when polars is already
    imported in this process, when the user pinned ``POLARS_MAX_THREADS``
    themselves, or outside Ray (no ``OMP_NUM_THREADS`` exported).
    """
    if "polars" not in sys.modules and "POLARS_MAX_THREADS" not in os.environ:
        omp = os.environ.get("OMP_NUM_THREADS")
        if omp:
            os.environ["POLARS_MAX_THREADS"] = omp
    import polars as pl

    # the cap can only be applied before the FIRST polars import in this
    # process; if some other path imported it earlier the oversubscription
    # regression returns silently — make that failure loud (once)
    global _warned_oversubscribed
    omp = os.environ.get("OMP_NUM_THREADS")
    if omp and not _warned_oversubscribed:
        try:
            if pl.thread_pool_size() > 2 * int(omp):
                _warned_oversubscribed = True
                import warnings

                warnings.warn(
                    f"polars thread pool ({pl.thread_pool_size()}) exceeds this "
                    f"worker's CPU share (OMP_NUM_THREADS={omp}): polars was "
                    "imported before condor_ray.runtime.worker_polars() could "
                    "cap it; expect node oversubscription",
                    RuntimeWarning,
                    stacklevel=2,
                )
        except Exception:
            pass
    return pl


_warned_oversubscribed = False


def cluster_cpus(default: int = 8) -> int:
    """CPU count of the connected Ray cluster; ``default`` when Ray is not
    initialized or unreachable.  Single-sourced here — the streaming engine,
    the ordered (wavelet) engine, and sizing heuristics all used their own
    inline copies with slightly different failure guards."""
    try:
        import ray

        if not ray.is_initialized():
            return default
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default
