"""In-suite DuckDB oracle gate: a representative slice of the SQL-paired
queries must hash-match DuckDB at sf0.001, so `python -m pytest` alone
proves cross-engine agreement (the full 21-query sweep lives in
tools/check_correctness.py)."""

from __future__ import annotations

import os

import pytest

duckdb = pytest.importorskip("duckdb")

SF_DIR = "/root/testdata/sf0.001"

pytestmark = [
    pytest.mark.usefixtures("ray_session"),
    pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent"),
]

# Since the round-4 consolidation the registry is 48 entries with 36
# SQL-paired — small enough to gate EVERY oracle pair here at sf0.001 (no
# curated slice to drift out of date; the sf0.01 sweep stays in
# tools/check_correctness.py).
def _all_paired():
    from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

    return sorted(ORACLES)


QUERY_SLICE = _all_paired()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        path = os.path.join(SF_DIR, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.mark.parametrize("name", QUERY_SLICE)
def test_query_matches_duckdb(name, duck):
    # Reuse the driver-stand-in's own comparison so this gate and the full
    # sweep can never drift apart.
    from tools.check_correctness import compare

    from pii_detection_test_ray.pipelines.queries import QUERIES
    from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

    ray_df = QUERIES[name](SF_DIR).to_pandas()
    sql_df = duck.execute(ORACLES[name]).fetchdf()
    assert compare(name, ray_df, sql_df) == []
