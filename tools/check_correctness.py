"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir, run the paired oracle SQL in DuckDB, and compare
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
(with query names given, only those entries run — quick re-checks)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    assert isinstance(result, pd.DataFrame)
    return result


def canonicalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row counts differ: {len(ray_df)} vs {len(sql_df)}")
        return problems
    a, b = canonicalize(ray_df), canonicalize(sql_df)
    for col in a.columns:
        # Dtype-strict: the driver hashes *typed* values, so int64 vs float64
        # (e.g. DuckDB sum() -> HUGEINT -> float64) must fail locally too.
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(
                f"{col}: dtype {a[col].dtype} != {b[col].dtype}")
    if problems:
        return problems
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if not (x == y or (math.isnan(x) and math.isnan(y))):
                    problems.append(f"{col}[{i}]: {x!r} != {y!r}")
                    break
            elif x != y:
                problems.append(f"{col}[{i}]: {x!r} != {y!r}")
                break
    return problems


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = set(only) - set(queries)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}

    con = duckdb.connect()
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')")

    failures = 0
    for name, fn in queries.items():
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows, cols={list(ray_df.columns)}")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL raised {exc}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + "; ".join(problems[:3]))
        else:
            print(f"[OK]   {name}: {len(ray_df)} rows match oracle")
    print(f"\n{failures} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
