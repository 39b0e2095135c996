"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at a given scale factor, compare row count, schema,
and order-insensitive value equality.  Usage:

    python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        want = normalize(con.execute(sql).df())
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: cols {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], want[c]
            # The driver value-hash is dtype-sensitive: int64 vs float64 with
            # identical values still mismatches (round-1 sessions_30m lesson).
            if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= {"i", "u", "f"}:
                print(f"[FAIL] {name}: column {c} dtype kind {a.dtype} vs {b.dtype}")
                failures += 1
                eq = False
                break
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(a.astype(float), b.astype(float), equal_nan=True):
                    eq = False
            else:
                if not (a.fillna("\0") == b.fillna("\0")).all() if a.dtype == object else not (a == b).all():
                    eq = False
            if not eq:
                print(f"[FAIL] {name}: column {c} differs")
                print("  ray:", a.head(3).tolist(), "\n  sql:", b.head(3).tolist())
                failures += 1
                break
        if eq:
            print(f"[OK]   {name}: {len(got)} rows match")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
