"""In-suite DuckDB oracle gate: a representative slice of the SQL-paired
queries must hash-match DuckDB at sf0.001, so `python -m pytest` alone
proves cross-engine agreement (the full 21-query sweep lives in
tools/check_correctness.py)."""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = [
    pytest.mark.usefixtures("ray_session"),
    pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent"),
]

# Fast, shape-diverse slice: combiner groupby, salted dedup, row-wise map,
# wide agg + filter, per-key sessionization, ANN top-k.
QUERY_SLICE = [
    "lang_profile",
    "dedup_exact",
    "fingerprints",
    "lineitem_rollup",
    "sessionize",
    "knn_cosine",
    "parts_by_brand",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        path = os.path.join(SF_DIR, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", QUERY_SLICE)
def test_query_matches_duckdb(name, duck, ray_session):
    from pii_detection_test_ray.pipelines.queries import QUERIES
    from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

    ray_df = _canon(QUERIES[name](SF_DIR).to_pandas())
    sql_df = _canon(duck.execute(ORACLES[name]).fetchdf())
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    for col in ray_df.columns:
        for i, (a, b) in enumerate(zip(ray_df[col], sql_df[col])):
            if isinstance(a, float) and isinstance(b, float):
                assert a == b or (math.isnan(a) and math.isnan(b)), (col, i, a, b)
            else:
                assert a == b, (col, i, a, b)
