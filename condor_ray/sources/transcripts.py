"""Deterministic synthetic transcripts stream (FIXTURES.md F1/F2/F3).

Replaces the reference's rate-limited synthetic sources
(bench/.../sources/input/UniformDistributionSource.java:18-128,
ZipfDistributionSource.java:33-222, UnorderedSource.java:114-127) with a
seeded Parquet generator whose files are the stream's micro-batch fragments:
fragment order = arrival order, and every 10th arrival carries an event-time
20 s in the past (UnorderedSource semantics) to exercise watermark drops.

Schema (BASELINE.json input_hint):
    conv_id:string  turn_idx:int32  role:string  text:string  tool:string
    ts:timestamp[us]   (+ arrival_seq:int64, the global arrival ordinal)

Zipf-skewed conversation lengths make some conv_ids hot (hot-key splitting
fixtures).  Everything derives from numpy's seeded Generator — same args,
same bytes.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
LATENESS_US = 20_000_000  # 20 s, UnorderedSource.java:120
_VOCAB_SIZE = 1000
_TOOLS = [f"tool_{i:02d}" for i in range(20)]
_ROLES = ["user", "assistant", "tool"]

_CACHE_ROOT = os.environ.get("CONDOR_RAY_CACHE", "/tmp/condor_ray_fixtures")


def _vocab(rng: np.random.Generator) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(_VOCAB_SIZE):
        ln = rng.integers(3, 10)
        words.append("".join(letters[rng.integers(0, 26, ln)]))
    return np.array(words)


def generate_stream_fixture(
    n_rows: int = 60_000,
    n_convs: int = 2_000,
    seed: int = 42,
    n_fragments: int = 8,
    turn_gap_ms: int = 1_000,
    out_dir: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> str:
    """Generate (or reuse cached) transcripts + tool_calls + queries fixture.

    Returns the fixture directory containing:
      transcripts/fragment-{i:05d}.parquet   (arrival-ordered stream)
      tool_calls.parquet                     (F2 join stream)
      queries.parquet                        (F3 evaluation stream)
    """
    spec = f"v6:{n_rows}:{n_convs}:{seed}:{n_fragments}:{turn_gap_ms}"
    if columns is not None:
        # thin soak fixtures: write only the requested columns (a 600M-row
        # full-text fixture is ~220 GB on disk; conv_id/role/ts is ~3 GB)
        spec += ":" + ",".join(sorted(columns))
    if out_dir is None:
        digest = hashlib.sha256(spec.encode()).hexdigest()[:12]
        out_dir = os.path.join(_CACHE_ROOT, digest)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            cached_spec = f.read()
        if cached_spec == spec:
            return out_dir
        # explicit out_dir reused with a different spec: returning the
        # stale fixture would silently run benchmarks at the wrong scale
        raise ValueError(
            f"fixture dir {out_dir} was built with spec {cached_spec!r}, "
            f"requested {spec!r} — pass a fresh out_dir (or omit it for "
            "the spec-hashed cache path)"
        )
    os.makedirs(os.path.join(out_dir, "transcripts"), exist_ok=True)

    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    # Zipf-skewed conversation lengths (ZipfDistributionSource analogue)
    raw = rng.zipf(1.5, n_convs).astype(np.int64)
    # cap conversation length (~400 turns) so the stream tail stays dense —
    # unbounded zipf tails stretch single conversations hours past the main
    # span, creating thousands of near-empty windows
    lengths = np.clip(raw * 3, 3, 400)
    scale_f = n_rows / lengths.sum()
    lengths = np.maximum((lengths * scale_f).astype(np.int64), 1)
    total = int(lengths.sum())

    conv_ids_u = np.array([f"c{i:08d}" for i in range(n_convs)])
    conv_col = np.repeat(np.arange(n_convs), lengths)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lengths])

    # per-conversation start offset across the stream span, ~1s per turn
    span_us = int(total * turn_gap_ms * 1000 / max(n_convs, 1) * 4)
    conv_start = rng.integers(0, max(span_us, 1), n_convs)
    nominal_ts = (
        BASE_TS_US
        + conv_start[conv_col]
        + turn_idx.astype(np.int64) * (turn_gap_ms * 1000)
        + rng.integers(0, turn_gap_ms * 1000, total)
    )

    # thin fixtures build only the requested columns END TO END — at 600M
    # rows each skipped int32 index array (and its order-permuted copy) is
    # ~2.4 GB of allocation + RNG work.  RNG draws that PRECEDE another
    # column's draws run unconditionally (the cheap int8 tool draw feeds
    # the stream consumed by the text pool), so any subset of requested
    # columns is byte-identical with the same-seed full fixture.
    def _need(name: str) -> bool:
        return columns is None or name in columns

    tool_idx = rng.integers(0, len(_TOOLS), total).astype(np.int8)
    is_tool = (turn_idx % 3) == 2  # _ROLES[2] == "tool"

    if _need("text"):
        # token-soup text drawn from a pool of 8192 pre-joined sentences
        # (per-row join of word lists is O(rows * words) Python work — a
        # pooled draw keeps generation fast at millions of rows while
        # staying deterministic; lengths still span ~15-350 chars)
        pool_words = rng.integers(3, 40, 8192)
        pool_flat = vocab[rng.integers(0, _VOCAB_SIZE, int(pool_words.sum()))]
        pool_off = np.concatenate([[0], np.cumsum(pool_words)])
        pool = pa.array(
            [
                " ".join(pool_flat[pool_off[i] : pool_off[i + 1]])
                for i in range(8192)
            ]
        )
        text_idx = rng.integers(0, 8192, total).astype(np.int32)

    # arrival order = nominal event order; every 10th arrival is 20 s late
    order = np.argsort(nominal_ts, kind="stable")
    ts = nominal_ts[order].copy()
    late_mask = (np.arange(total) % 10) == 9  # every 10th arrival
    ts[late_mask] -= LATENESS_US

    # string columns as Arrow dictionary arrays — indices only, no per-row
    # Python strings (a 60M-row fixture would need ~80 GB as numpy unicode)
    conv_dict = pa.array(conv_ids_u.tolist())
    role_dict = pa.array(_ROLES)
    tool_dict = pa.array(_TOOLS)
    if _need("conv_id"):
        conv_idx_sorted = conv_col[order].astype(np.int32)
    if _need("turn_idx") or _need("role"):
        turn_sorted = turn_idx[order]
    if _need("role"):
        role_idx_sorted = (turn_sorted % 3).astype(np.int8)
    if _need("tool"):
        tool_idx_sorted = np.where(
            is_tool[order], tool_idx[order], -1
        ).astype(np.int8)
    if _need("text"):
        text_idx_sorted = text_idx[order]

    def _fragment_table(lo: int, hi: int) -> pa.Table:
        sl = slice(lo, hi)
        tool_i = tool_idx_sorted[sl] if _need("tool") else None
        # per-column thunks: thin fixtures build ONLY the requested columns
        # (the dictionary->string casts dominate fragment-write time)
        makers = {
            "conv_id": lambda: pa.DictionaryArray.from_arrays(
                pa.array(conv_idx_sorted[sl]), conv_dict
            ).cast(pa.string()),
            "turn_idx": lambda: pa.array(turn_sorted[sl], type=pa.int32()),
            "role": lambda: pa.DictionaryArray.from_arrays(
                pa.array(role_idx_sorted[sl]), role_dict
            ).cast(pa.string()),
            "text": lambda: pa.DictionaryArray.from_arrays(
                pa.array(text_idx_sorted[sl]), pool
            ).cast(pa.string()),
            "tool": lambda: pa.DictionaryArray.from_arrays(
                pa.array(tool_i, mask=tool_i < 0), tool_dict
            ).cast(pa.string()),
            "ts": lambda: pa.array(ts[sl], type=pa.timestamp("us")),
            "arrival_seq": lambda: pa.array(np.arange(lo, hi, dtype=np.int64)),
        }
        return pa.table(
            {
                name: mk()
                for name, mk in makers.items()
                if columns is None or name in columns
            }
        )

    bounds = np.linspace(0, total, n_fragments + 1).astype(int)
    for i in range(n_fragments):
        pq.write_table(
            _fragment_table(bounds[i], bounds[i + 1]),
            os.path.join(out_dir, "transcripts", f"fragment-{i:05d}.parquet"),
        )

    if total > 10_000_000 or columns is not None:
        # throughput-scale fixture: skip the F2/F3 side tables (join and
        # query-stream tests use the small fixtures)
        with open(done, "w") as f:
            f.write(spec)
        return out_dir
    table = pa.concat_tables(
        [_fragment_table(bounds[i], bounds[i + 1]) for i in range(n_fragments)]
    )

    # F2: tool_calls — one row per tool turn, +5% orphans, +5% duplicates
    tool_rows = table.filter(pa.compute.equal(table["role"], "tool"))
    n_tc = tool_rows.num_rows
    tc_conv = tool_rows["conv_id"].to_numpy(zero_copy_only=False)
    tc_turn = tool_rows["turn_idx"].to_numpy(zero_copy_only=False)
    tc_tool = tool_rows["tool"].to_numpy(zero_copy_only=False)
    tc_ts = tool_rows["ts"].cast(pa.int64()).to_numpy() + rng.integers(
        0, 5_000_000, n_tc
    )
    call_id = np.array([f"{c}_{t}" for c, t in zip(tc_conv, tc_turn)])
    status = np.where(rng.random(n_tc) < 0.9, "ok", "error")
    n_orph = max(n_tc // 20, 1)
    n_dup = max(n_tc // 20, 1)
    dup_idx = rng.integers(0, n_tc, n_dup)
    orph_conv = np.array([f"orphan{i:06d}" for i in range(n_orph)])
    tc = pa.table(
        {
            "conv_id": pa.array(np.concatenate([tc_conv, tc_conv[dup_idx], orph_conv])),
            "call_id": pa.array(
                np.concatenate(
                    [call_id, call_id[dup_idx], np.char.add("call_", orph_conv)]
                )
            ),
            "tool": pa.array(
                np.concatenate(
                    [tc_tool, tc_tool[dup_idx],
                     np.array(_TOOLS)[rng.integers(0, len(_TOOLS), n_orph)]]
                )
            ),
            "status": pa.array(
                np.concatenate(
                    [status, status[dup_idx],
                     np.where(rng.random(n_orph) < 0.9, "ok", "error")]
                )
            ),
            "ts": pa.array(
                np.concatenate(
                    [tc_ts, tc_ts[dup_idx],
                     rng.integers(ts.min(), ts.max(), n_orph)]
                ),
                type=pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tc, os.path.join(out_dir, "tool_calls.parquet"))

    # F3: queries — keys from the conv_id hash domain, ts across the span
    from ..hashing import java_string_hash_array

    n_q = max(n_rows // 10, 100)
    q_convs = conv_ids_u[rng.integers(0, n_convs, n_q)]
    q_keys = java_string_hash_array(q_convs.tolist())
    q_ts = rng.integers(ts.min(), ts.max(), n_q)
    q_strata = np.where(
        rng.random(n_q) < 0.5, np.array(_ROLES)[rng.integers(0, 3, n_q)], None
    )
    pq.write_table(
        pa.table(
            {
                "query_key": pa.array(q_keys, type=pa.int32()),
                "query_ts": pa.array(q_ts, type=pa.timestamp("us")),
                "stratum": pa.array(q_strata, type=pa.string()),
            }
        ),
        os.path.join(out_dir, "queries.parquet"),
    )

    with open(done, "w") as f:
        f.write(spec)
    return out_dir


def transcript_fragments(fixture_dir: str) -> list[str]:
    frag_dir = os.path.join(fixture_dir, "transcripts")
    return sorted(
        os.path.join(frag_dir, f) for f in os.listdir(frag_dir) if f.endswith(".parquet")
    )


def read_transcripts(fixture_dir: str, columns: list[str] | None = None):
    """Transcripts as a Ray Dataset (fragment order preserved by path sort)."""
    import ray.data as rd

    return rd.read_parquet(transcript_fragments(fixture_dir), columns=columns)
