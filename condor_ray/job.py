"""``ray job submit``-compatible entrypoint.

On a real cluster:

    ray job submit --working-dir . -- \\
        python -m condor_ray.job --pipeline cm --input /data/transcripts \\
        --out /data/out --window-ms 60000 --parallelism 64 \\
        --checkpoint-dir /data/ckpt

``ray job submit`` exports RAY_ADDRESS into the driver environment, so
``ray.init(address="auto")`` attaches to the running cluster; standalone
invocations fall back to a local session.  This module is a CLI entry
point and therefore OWNS its Ray session (the library itself never calls
``ray.init``); it prints exactly one JSON summary line on success.

``--resume`` continues a checkpointed streaming job byte-identically
after a crash (per-partition lineage manifest + atomic emission files —
already-emitted fragments are skipped).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _fragments(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    frags = sorted(
        glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True)
    )
    if not frags:
        raise SystemExit(f"no parquet fragments under {input_path!r}")
    return frags


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="python -m condor_ray.job")
    ap.add_argument(
        "--pipeline",
        required=True,
        choices=["cm", "hll", "counts", "wavelets", "cep", "sessions",
                 "asof", "clean"],
        help="cm/hll: streaming windowed synopses; counts: exact windowed "
        "counts; wavelets: order-based Haar managers; cep: 3-step pattern "
        "matcher; sessions: gap-merged session windows; asof: every tool "
        "turn joined to its conversation's latest user turn; clean: the "
        "composed corpus-cleaning flagship over (doc_id, text) parquet",
    )
    ap.add_argument("--input", required=True, help="parquet file or directory")
    ap.add_argument(
        "--benchmark", default=None,
        help="parquet file or directory of eval-set texts for the "
        "decontamination gate (clean only; omit to skip the gate)",
    )
    ap.add_argument("--out", required=True, help="emission directory")
    ap.add_argument("--window-ms", type=int, default=None,
                    help="window size in ms (cm/hll/counts/wavelets/cep; default 60000)")
    ap.add_argument("--slide-ms", type=int, default=None)
    ap.add_argument("--gap-ms", type=int, default=None,
                    help="session gap in ms (sessions only; default 1800000)")
    ap.add_argument("--key", default="conv_id")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=4,
                    help="checkpoint cadence in fragments")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--no-final-flush", action="store_true",
        help="leave open windows in state instead of force-closing at end "
        "of input — for jobs that will be resumed with more fragments "
        "(a final flush advances the watermark past the stream end, so a "
        "later continuation would drop its rows as late)",
    )
    args = ap.parse_args(argv)

    # reject flag/pipeline combos the branch below would silently drop —
    # an operator passing --resume to a batch pipeline must hear "this
    # recomputes from scratch" at submit time, not after the crash
    streaming = args.pipeline in ("cm", "hll", "cep", "sessions")
    if not streaming:
        for flag, on in (
            ("--checkpoint-dir", args.checkpoint_dir is not None),
            ("--resume", args.resume),
            ("--no-final-flush", args.no_final_flush),
        ):
            if on:
                ap.error(
                    f"{flag} is only supported by the streaming pipelines "
                    f"(cm/hll/cep/sessions); --pipeline {args.pipeline} is "
                    "batch and always recomputes from scratch"
                )
    if args.slide_ms is not None and args.pipeline not in ("cm", "hll"):
        ap.error(
            f"--slide-ms only applies to cm/hll (sliding synopsis windows); "
            f"--pipeline {args.pipeline} ignores it"
        )
    # --window-ms / --gap-ms default to None so an explicit value on a
    # pipeline that ignores it errors instead of silently dropping (the
    # same rule --slide-ms already follows); the per-pipeline defaults
    # are applied after validation
    if args.window_ms is not None and args.pipeline in (
        "sessions", "asof", "clean"
    ):
        ap.error(
            f"--window-ms is ignored by --pipeline {args.pipeline} "
            "(sessions windows are gap-defined via --gap-ms; asof and "
            "clean have no window)"
        )
    if args.benchmark is not None and args.pipeline != "clean":
        ap.error(
            f"--benchmark only applies to clean (decontamination gate); "
            f"--pipeline {args.pipeline} ignores it"
        )
    if args.gap_ms is not None and args.pipeline != "sessions":
        ap.error(
            f"--gap-ms only applies to sessions (gap-defined windows); "
            f"--pipeline {args.pipeline} ignores it"
        )
    if args.window_ms is None:
        args.window_ms = 60_000
    if args.gap_ms is None:
        args.gap_ms = 30 * 60 * 1000
    if args.slide_ms is not None and args.slide_ms <= 0:
        # the window constructor below uses `if args.slide_ms` — a falsy 0
        # would silently build a tumbling window the operator didn't ask for
        ap.error("--slide-ms must be a positive number of milliseconds")
    if args.window_ms is not None and args.window_ms <= 0:
        # window-ms 0 would divide-by-zero in the slice assignment (numpy
        # int64 // 0 only WARNS and yields 0 — every row lands in one
        # zero-width window instead of erroring)
        ap.error("--window-ms must be a positive number of milliseconds")

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is set and "auto" attaches to
        # the cluster; standalone falls back to a local session
        try:
            ray.init(address="auto", ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    parallelism = args.parallelism or max(2, min(16, ncpu // 2))
    frags = _fragments(args.input)

    from condor_ray.config import BuildConfiguration, KeySpec
    from condor_ray.windows import SlidingWindow, TumblingWindow

    window = (
        SlidingWindow(args.window_ms, args.slide_ms)
        if args.slide_ms
        else TumblingWindow(args.window_ms)
    )

    summary: dict = {"pipeline": args.pipeline, "out": args.out,
                     "fragments": len(frags), "num_cpus": ncpu}
    if args.pipeline in ("cm", "hll"):
        from condor_ray.engine.streaming import StreamingSynopsisJob

        cfg = BuildConfiguration(
            synopsis="CountMinSketch" if args.pipeline == "cm"
            else "HyperLogLogSketch",
            params=(65536, 5, 7) if args.pipeline == "cm" else (16, 7),
            windows=[window],
            key=KeySpec(args.key, "java_hash"),
            parallelism=parallelism,
        )
        job = StreamingSynopsisJob(
            # the job unions conv_id/ts/key into the projection itself
            cfg, args.out,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
        )
        summary.update(
            job.run(frags, resume=args.resume,
                    final_flush=not args.no_final_flush)
        )
        job.shutdown()
    elif args.pipeline == "cep":
        from condor_ray.engine.streaming_cep import StreamingPatternJob
        from condor_ray.pipelines.cep import Step

        job = StreamingPatternJob(
            [
                Step("role", "eq", "user"),
                Step("role", "eq", "assistant"),
                Step("tool", "notnull"),
            ],
            args.out,
            within_ms=args.window_ms,
            parallelism=parallelism,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
        )
        summary.update(
            job.run(frags, resume=args.resume,
                    final_flush=not args.no_final_flush)
        )
        job.shutdown()
    elif args.pipeline == "sessions":
        from condor_ray.engine.streaming_sessions import StreamingSessionJob
        from condor_ray.windows import SessionWindow

        cfg = BuildConfiguration(
            synopsis="CountMinSketch",
            params=(1024, 3, 7),
            windows=[SessionWindow(args.gap_ms)],
            key=KeySpec(args.key, "java_hash"),
            parallelism=parallelism,
        )
        job = StreamingSessionJob(
            cfg, args.out, checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
        )
        summary.update(
            job.run(frags, resume=args.resume,
                    final_flush=not args.no_final_flush)
        )
        job.shutdown()
    elif args.pipeline == "counts":
        import ray.data as rd

        from condor_ray.engine.batch import windowed_counts

        ds = rd.read_parquet(frags, columns=["ts"])
        windowed_counts(ds, TumblingWindow(args.window_ms)).write_parquet(
            args.out
        )
        summary["rows"] = ds.count()
    elif args.pipeline == "asof":
        import pyarrow.compute as pc
        import ray.data as rd

        from condor_ray.pipelines.temporal_join import asof_join

        def _side(role):
            def f(b):
                if b.num_rows == 0 or "role" not in b.schema.names:
                    return b
                return b.filter(
                    pc.is_valid(b["tool"]) if role == "tool"
                    else pc.equal(b["role"], role)
                )

            return f

        cols = ["conv_id", "turn_idx", "role", "tool", "ts"]
        res = asof_join(
            rd.read_parquet(frags, columns=cols).map_batches(
                _side("tool"), batch_format="pyarrow"
            ),
            rd.read_parquet(frags, columns=cols).map_batches(
                _side("user"), batch_format="pyarrow"
            ),
            left_cols={"turn_idx": "turn_idx"},
            right_cols={"user_ts": "ts", "user_turn": "turn_idx"},
            right_order=("user_turn",),
        )
        res.write_parquet(args.out)
        summary["rows"] = res.count()
        # exchange footprint (live_bytes_hwm, waves, …) into the manifest
        from condor_ray.engine.exchange import LAST_EXCHANGE_STATS

        summary["exchange"] = dict(LAST_EXCHANGE_STATS)
    elif args.pipeline == "clean":
        import pandas as pd
        import ray.data as rd

        from condor_ray.pipelines.clean import clean_corpus

        bench = None
        if args.benchmark:
            # eval sets are small and driver-resident by design — the
            # corpus side is the thing that streams
            bench = pd.concat(
                [
                    pd.read_parquet(p, columns=["text"])
                    for p in _fragments(args.benchmark)
                ],
                ignore_index=True,
            )
        res = clean_corpus(
            rd.read_parquet(frags, columns=["doc_id", "text"]), bench
        )
        res.write_parquet(args.out)
        # rows from the written footers — a .count() would re-execute the
        # whole plan (including the dedup shuffle) a second time
        import pyarrow.parquet as pq

        summary["rows_kept"] = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(args.out, "**", "*.parquet"),
                               recursive=True)
        )
    elif args.pipeline == "wavelets":
        from condor_ray.engine.ordered import (
            build_windowed_wavelets_from_fragments,
        )

        res = build_windowed_wavelets_from_fragments(
            frags, TumblingWindow(args.window_ms), size=1024,
            parallelism=4, key=KeySpec("turn_idx", "value"),
            columns=["conv_id", "turn_idx", "ts"],
        )
        res.write_parquet(args.out)
        summary["windows"] = res.count()

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
    import ray

    ray.shutdown()
