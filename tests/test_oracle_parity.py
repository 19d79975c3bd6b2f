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

# Fast, shape-diverse slice: combiner groupby, salted dedup, row-wise map,
# wide agg + filter, per-key sessionization, ANN top-k, as-of join, range
# join, exact count-distinct, temporal rollup.
QUERY_SLICE = [
    "lang_profile",
    "dedup_exact",
    "fingerprints",
    "lineitem_rollup",
    "sessionize",
    "knn_cosine",
    "parts_by_brand",
    "events_asof_orders",
    "value_bands",
    "events_rollup",
    "orders_by_month",
    "decontaminate_substring",
    "dedup_page_lines",
    "bpe_token_counts",
    "vocab_top_tokens",
    "jaccard_pairs_exact",
    "customer_order_counts",
    "exact_quantiles",
    "grouping_rollup",
    "events_value_stats",
    "adaptive_quality_gate",
    "exact_distinct_users",
    "running_user_totals",
    "json_props_rollup",
    "fuzzy_supplier_pairs",
    "sources_per_lang",
    "orders_monthly_dense",
    "quantiles_cont",
    "events_hopping",
    "lang_source_pivot",
    "sample_per_lang",
    "dup_clusters",
    "ngram_jaccard_pairs",
    "pack_sequences",
]


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
