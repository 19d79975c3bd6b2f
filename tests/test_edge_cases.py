"""Edge cases: empty/degenerate inputs, encoding damage, stale lineage."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


class TestDegenerateDocuments:
    def test_empty_and_whitespace_text(self):
        from pii_detection_test_ray.pipelines.oracle import process_document

        for text in ("", "   ", "\n\n\n"):
            row = process_document(None, text=text)
            assert row["keep"] is False
            assert row["n_pii_spans"] == 0
            assert row["scrubbed_text"] == text

    def test_invalid_utf8_html(self):
        from pii_detection_test_ray.functions.html_text import extract_text

        # utf-8 decode with errors="replace": must not raise, must be
        # deterministic.
        broken = b"<html><body><p>ok \xff\xfe broken</p></body></html>"
        out1, out2 = extract_text(broken), extract_text(broken)
        assert out1 == out2 and "ok" in out1

    def test_single_char_and_huge_repeat(self):
        from pii_detection_test_ray.pipelines.oracle import process_document

        assert process_document(None, text="a")["keep"] is False
        big = process_document(None, text="spam " * 40_000)
        assert big["keep"] is False
        assert "word_repetition" in big["drop_reasons"]

    def test_detector_on_degenerate_inputs(self):
        from pii_detection_test_ray.functions.pii_regex import detect_and_scrub

        for text in ("", "*", "-" * 100, "\x00\x01"):
            values, scrubbed, n = detect_and_scrub(text)
            assert scrubbed == text and n == 0
            assert all(v is None for v in values.values())


class TestLineageStaleness:
    def test_stale_pipeline_version_reprocesses(self, ray_session, tmp_path):
        import json

        from pii_detection_test_ray.pipelines.quality_filter import build_pipeline
        from pii_detection_test_ray.sources.corpus import CorpusConfig, write_corpus
        from pii_detection_test_ray.state import lineage

        corpus = str(tmp_path / "c")
        write_corpus(corpus, CorpusConfig(n_docs=40), shards=2)
        files = sorted(
            os.path.join(corpus, "documents", f)
            for f in os.listdir(f"{corpus}/documents")
        )
        out = str(tmp_path / "o")
        lineage.resumable_run(files, out, build_pipeline, group_size=2)
        # Corrupt the manifest's version → must reprocess, not skip.
        mdir = os.path.join(out, "_lineage")
        name = sorted(os.listdir(mdir))[0]
        entry = json.load(open(os.path.join(mdir, name)))
        entry["pipeline_version"] = "stale"
        json.dump(entry, open(os.path.join(mdir, name), "w"))
        results = lineage.resumable_run(files, out, build_pipeline, group_size=2)
        assert sum(1 for r in results if not r.skipped) == 1
        # The reprocessed partition must hold exactly its input rows — a
        # rerun that appends instead of replacing would double them.
        import pyarrow.parquet as pq

        total_out = 0
        for part in os.listdir(out):
            if part.startswith("part-"):
                for f in os.listdir(os.path.join(out, part)):
                    if f.endswith(".parquet"):
                        total_out += pq.ParquetFile(
                            os.path.join(out, part, f)
                        ).metadata.num_rows
        assert total_out == 40


class TestJoinOperatorEdges:
    """Empty/degenerate inputs through the round-2 join operators."""

    def test_asof_join_empty_left(self, ray_session):
        import ray.data

        from pii_detection_test_ray.stages.asof import asof_join
        from datetime import datetime

        base = datetime(2024, 1, 1)
        left = ray.data.from_items(
            [{"k": 1, "t": base, "lv": 0}], override_num_blocks=1
        ).filter(lambda r: False)
        right = ray.data.from_items(
            [{"k": 1, "t2": base, "rv": "x"}], override_num_blocks=1
        )
        assert asof_join(left, right, "k", "t", "t2").take_all() == []

    def test_interval_join_empty_input(self, ray_session):
        import ray.data

        from pii_detection_test_ray.stages.joins import interval_lookup_join

        ds = ray.data.from_items(
            [{"v": 1.0}], override_num_blocks=1
        ).filter(lambda r: False)
        out = interval_lookup_join(ds, "v", [("a", 0.0, 10.0)]).take_all()
        assert out == []

    def test_bucketed_hash_join_no_matches(self, ray_session):
        import ray.data

        from pii_detection_test_ray.stages.joins import bucketed_hash_join

        left = ray.data.from_items([{"k": 1, "lv": 1}], override_num_blocks=1)
        right = ray.data.from_items([{"k": 2, "rv": 2}], override_num_blocks=1)
        assert bucketed_hash_join(left, right, "k", num_buckets=2).take_all() == []

    def test_broadcast_hash_join_empty_right(self, ray_session):
        import ray.data

        from pii_detection_test_ray.stages.joins import broadcast_hash_join

        left = ray.data.from_items([{"k": 1, "lv": 1}], override_num_blocks=1)
        right = ray.data.from_items(
            [{"k": 1, "rv": 2}], override_num_blocks=1
        ).filter(lambda r: False)
        assert broadcast_hash_join(left, right, "k").take_all() == []

    def test_bucketed_semi_join_empty_big(self, ray_session):
        import ray.data

        from pii_detection_test_ray.stages.joins import bucketed_semi_join

        big = ray.data.from_items(
            [{"k": 1, "v": 1}], override_num_blocks=1
        ).filter(lambda r: False)
        keys = ray.data.from_items([{"k": 1}], override_num_blocks=1)
        assert bucketed_semi_join(big, keys, "k", num_buckets=2).take_all() == []


class TestNullTextRows:
    """A NULL text row anywhere in the documents table must behave as ""
    in every text operator (parquet from real crawls has them), not raise
    TypeError — the round-2 advice found the guard applied inconsistently."""

    @pytest.fixture()
    def null_doc_dir(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # Docs 5-7 keep the non-null queries non-vacuous next to the null
        # rows (docs ≥5 tokens for cross-doc 5-grams; doc 7's fingerprint
        # starts with '0' so the deterministic samples select something) —
        # an engine Dataset that returns 0 rows loses its schema and the
        # cross-engine compare below would flag columns, not semantics.
        long_a = "lorem ipsum dolor sit amet consectetur adipiscing elit"
        long_b = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do variant 11"
        table = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta", None, "",
                        "alpha beta gamma delta", long_a, long_a, long_b,
                    ],
                    pa.string(),
                ),
                "lang": pa.array(
                    ["en", "en", "ko", "en", None, "ko", "en"], pa.string()
                ),
                "source": pa.array(
                    ["web", "web", None, "web", "news", "web", "web"],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    [22, 0, None, 22, len(long_a), len(long_a), len(long_b)],
                    pa.int64(),
                ),
            }
        )
        pq.write_table(table, tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_text_queries_survive_null_text(self, ray_session, null_doc_dir):
        from pii_detection_test_ray.pipelines.queries import QUERIES

        # every documents-only text operator that loops over the text column
        names = [
            "fingerprints", "token_counts", "quality_stats",
            "gopher_repetition", "crossdoc_ngrams", "doc_samples",
            "dedup_exact", "dedup_page_lines", "vocab_top_tokens",
            "decontaminate", "minhash_pairs", "simhash_pairs",
            "tfidf_top_terms", "ngram_jaccard_pairs", "pack_sequences",
            "dup_clusters",
        ]
        for name in names:
            rows = QUERIES[name](null_doc_dir).take_all()
            assert isinstance(rows, list), name

    def test_null_text_oracles_match_duckdb(self, ray_session, null_doc_dir):
        """The 'null text behaves as empty' invariant must hold CROSS-ENGINE,
        not just not-crash: every SQL-paired text query is hash-compared
        against its DuckDB oracle on a corpus containing a NULL text row
        (round-3 advice: oracles without coalesce(text,'') yield NULL token
        lists and diverge exactly here)."""
        duckdb = pytest.importorskip("duckdb")

        from tools.check_correctness import compare, to_pandas

        from pii_detection_test_ray.pipelines.queries import QUERIES
        from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{null_doc_dir}/documents.parquet')"
        )
        names = [
            "fingerprints", "token_counts", "quality_stats",
            "gopher_repetition", "crossdoc_ngrams", "doc_samples",
            "dedup_exact", "dedup_page_lines", "vocab_top_tokens",
            "tfidf_top_terms", "jaccard_pairs_exact", "dup_clusters",
            "ngram_jaccard_pairs", "pack_sequences", "decontaminate",
            # null lang / source / n_chars coverage (round-4 close):
            "exact_quantiles", "adaptive_quality_gate", "top_docs_per_lang",
            "grouping_rollup", "lang_source_pivot", "top_longest",
            # round-5 pairing (planted signatures key on doc_id only):
            "simhash_pairs",
        ]
        problems = []
        for name in names:
            got = to_pandas(QUERIES[name](null_doc_dir))
            exp = con.execute(ORACLES[name]).fetchdf()
            problems += [(name, p) for p in compare(name, got, exp)]
        assert problems == []

    def test_null_behaves_as_empty_string(self, ray_session, null_doc_dir):
        from pii_detection_test_ray.pipelines.queries import QUERIES

        rows = {r["doc_id"]: r for r in QUERIES["fingerprints"](null_doc_dir).take_all()}
        # null text (doc 2) and "" text (doc 3) fingerprint identically
        assert rows[2]["fingerprint"] == rows[3]["fingerprint"]
        assert rows[1]["fingerprint"] != rows[2]["fingerprint"]
        gop = {r["doc_id"]: r for r in QUERIES["gopher_repetition"](null_doc_dir).take_all()}
        assert gop[2]["n_tokens"] == 0 and gop[2]["keep_flag"] == 1
import json, os
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def test_json_props_rollup_hostile_props(ray_session, tmp_path):
    """Malformed / non-object / non-integer-k props are 'absent' on BOTH
    engines (engine: guarded parse; oracle: TRY_CAST) — no crash, equal
    rollups."""
    duckdb = pytest.importorskip("duckdb")

    from pii_detection_test_ray.pipelines.queries import q_json_props_rollup
    from tools.check_correctness import compare, to_pandas
    from pii_detection_test_ray.pipelines.sql_oracles import ORACLES as _O

    props = [
        '{"k": 3}', '{"k": "abc"}', '{"k": 12.7}', "[1]", "not json",
        "", None, '{"other": 1}', '{"k": true}', '{"k": 4}',
    ]
    t = pa.table(
        {
            "event_type": pa.array(["x"] * len(props), pa.string()),
            "props": pa.array(props, pa.string()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "events.parquet"))
    got = to_pandas(q_json_props_rollup(str(sf)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    sql_df = con.execute(_O["json_props_rollup"]).df()
    problems = compare("json_props_rollup", got, sql_df)
    assert not problems, problems
    row = got.iloc[0]
    assert row["n_with_k"] == 2 and row["sum_k"] == 7  # only the int ks


def test_null_text_rows_survive_every_stage(ray_session):
    """A NULL text row (routine in real crawl parquet) must behave as an
    empty string through EVERY text stage — not just the ones guarded in
    round 2 (textstats/langid/detect/quality_gate were latent crashes)."""
    import pyarrow as pa
    import ray.data

    from pii_detection_test_ray.stages.detect import pii_scrub_batch
    from pii_detection_test_ray.stages.langid import LangIdBatcher
    from pii_detection_test_ray.stages.quality_gate import quality_features_batch
    from pii_detection_test_ray.stages.textstats import textstats_batch

    rows = [
        {"url": "u1", "text": "담당자: 박서연 (010-9999-8888) normal row"},
        {"url": "u2", "text": None},
        {"url": "u3", "text": ""},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)

    out = ds.map_batches(
        quality_features_batch, batch_format="pyarrow"
    ).map_batches(LangIdBatcher(), batch_format="pyarrow").map_batches(
        pii_scrub_batch, batch_format="pyarrow"
    ).map_batches(textstats_batch, batch_format="pyarrow").take_all()
    by_url = {r["url"]: r for r in out}
    assert len(out) == 3
    assert by_url["u1"]["n_pii_spans"] >= 2  # detection still fires
    for u in ("u2", "u3"):  # null ≡ empty
        assert by_url[u]["q_n_chars"] == 0
        assert by_url[u]["n_pii_spans"] == 0


class TestNullEventsRows:
    """The 'null behaves sanely' invariant extended from text to the EVENTS
    family (round-4 proactive close of the round-3-advice pattern): null
    ts / user_id / event_type / value rows must give the same answers as
    DuckDB, not just not-crash. Conventions pinned cross-engine:
    * null timestamps sort LAST (SQL window order; DuckDB ASOF merge
      order) — sessionize non-breaks, running-total order, as-of matching;
    * a NULL key never equals (as-of, EXISTS split) but IS its own group
      (GROUP BY / PARTITION BY);
    * count(DISTINCT user_id) skips NULL users, their groups remain;
    * SUM skips NULL values; all-null frames coalesce to 0."""

    @pytest.fixture()
    def null_events_dir(self, tmp_path):
        from datetime import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        def ts(m):
            return datetime(2024, 5, 1, 10 + m // 60, m % 60)

        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(12), pa.int64()),
                    "ts": pa.array(
                        [ts(0), ts(10), None, ts(40), ts(70), ts(100), ts(5),
                         ts(20), None, ts(90), ts(130), ts(45)],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array(
                        [1, 1, 1, None, 2, 2, 3, None, 3, 3, 1, 2], pa.int64()
                    ),
                    "event_type": pa.array(
                        ["a", "a", None, "a", "b", "b", None, "a", "b", "b",
                         "a", None],
                        pa.string(),
                    ),
                    "value": pa.array(
                        [1.5, None, 2.5, 3.0, None, 0.25, 1.0, 2.0, None, 4.5,
                         0.75, None],
                        pa.float64(),
                    ),
                    "props": pa.array(['{"k":1}'] * 12, pa.string()),
                }
            ),
            str(tmp_path / "events.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(6), pa.int64()),
                    "o_custkey": pa.array([1, 2, None, 3, 1, 2], pa.int64()),
                    "o_orderdate": pa.array(
                        [ts(0), ts(30), ts(10), None, ts(60), None],
                        pa.timestamp("us"),
                    ),
                    "o_orderpriority": pa.array(
                        ["P1", "P2", "P3", "P4", "P5", "P6"], pa.string()
                    ),
                    "o_totalprice": pa.array(
                        [10.0, None, 30.0, 40.0, 50.0, 60.0]
                    ),
                    "o_orderstatus": pa.array(["O", "F", "O", "F", "O", "F"]),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, None], pa.int64()),
                    "c_acctbal": pa.array([6000.0, 100.0, None, 7000.0]),
                    "c_mktsegment": pa.array(["BUILDING", "AUTO", "AUTO", None]),
                    "c_nationkey": pa.array([0, 0, None, 0], pa.int64()),
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0], pa.int64()),
                    "n_regionkey": pa.array([0], pa.int64()),
                    "n_name": pa.array(["N"], pa.string()),
                }
            ),
            str(tmp_path / "nation.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array([0], pa.int64()),
                    "r_name": pa.array(["R"], pa.string()),
                }
            ),
            str(tmp_path / "region.parquet"),
        )
        return str(tmp_path)

    def _duck(self, d):
        duckdb = pytest.importorskip("duckdb")

        con = duckdb.connect()
        for t in ("events", "orders", "customer", "nation", "region"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        return con

    def test_strict_hash_compare(self, ray_session, null_events_dir):
        """Queries whose null-bearing outputs the strict comparator can
        handle go through the driver-stand-in compare itself."""
        from tools.check_correctness import compare, to_pandas

        from pii_detection_test_ray.pipelines.queries import QUERIES
        from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

        con = self._duck(null_events_dir)
        problems = []
        for name in (
            "sessionize", "events_value_stats", "exact_distinct_users",
            "value_bands", "events_asof_orders", "orders_exists_split",
            "json_props_rollup", "customer_order_counts",
            "orders_monthly_dense", "customers_per_region",
        ):
            got = to_pandas(QUERIES[name](null_events_dir))
            exp = con.execute(ORACLES[name]).fetchdf()
            problems += [(name, p) for p in compare(name, got, exp)]
        assert problems == []

    def test_null_key_outputs_match_rowwise(self, ray_session, null_events_dir):
        """events_windows / running_user_totals emit rows with NULL group
        values (null window_start, null user_id) — NaT/NaN defeat the
        strict comparator's sort, so these two compare as null-normalized
        row multisets instead."""
        from pii_detection_test_ray.pipelines.queries import QUERIES
        from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

        con = self._duck(null_events_dir)

        def norm(rows):
            return sorted(
                (
                    tuple(None if v is None or v != v else v for v in r)
                    for r in rows
                ),
                key=repr,
            )

        for name, cols in (
            ("running_user_totals", ["event_id", "user_id", "cum_cents"]),
            (
                "events_windows",
                ["window_kind", "event_type", "window_start", "n_events",
                 "total_value_micros"],
            ),
        ):
            eng = [
                tuple(r[c] for c in cols)
                for r in QUERIES[name](null_events_dir).take_all()
            ]
            ora = con.execute(
                f"SELECT {', '.join(cols)} FROM ({ORACLES[name]})"
            ).fetchall()
            assert norm(eng) == norm(ora), name


class TestNullMiscTables:
    """Null-bearing lineitem / supplier / embeddings tables: the remaining
    SQL-paired families stay cross-engine green (lineitem_rollup and
    fuzzy_supplier_pairs were already null-safe; knn filters unembedded
    rows — a NULL vector has no cosine, and Ray-side they would crash the
    matrix kernels)."""

    def test_lineitem_supplier_embeddings_nulls(self, ray_session, tmp_path):
        from datetime import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        duckdb = pytest.importorskip("duckdb")

        from tools.check_correctness import compare, to_pandas

        from pii_detection_test_ray.pipelines.queries import QUERIES
        from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(["A", None, "A", "R"], pa.string()),
                    "l_linestatus": pa.array(["F", "F", None, "O"], pa.string()),
                    "l_quantity": pa.array([1.0, 2.0, None, 4.0]),
                    "l_extendedprice": pa.array([10.0, None, 30.0, 40.0]),
                    "l_discount": pa.array([0.1, 0.2, 0.3, None]),
                    "l_shipdate": pa.array(
                        [datetime(1995, 1, 1), datetime(1995, 1, 2), None,
                         datetime(1995, 1, 3)],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "s_name": pa.array(
                        ["Supplier#1", None, "Supplier#2", "Supplier#1x"],
                        pa.string(),
                    ),
                }
            ),
            str(tmp_path / "supplier.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(
                        [[1.0] * 8, None, [0.5] * 8], pa.list_(pa.float32())
                    ),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        con = duckdb.connect()
        for t in ("lineitem", "supplier", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
            )
        problems = []
        for name in (
            "lineitem_rollup", "fuzzy_supplier_pairs", "knn_cosine",
            # round-5 pairings: vec 1 is NULL, so knn_ivf must drop that
            # query vector (query_id stays = vec_id) and the near-dup
            # plant must skip it; vectors here are 8-dim, so the planted
            # plane matrix must infer width from the data.
            "knn_ivf", "embedding_dup_pairs",
        ):
            got = to_pandas(QUERIES[name](str(tmp_path)))
            exp = con.execute(ORACLES[name]).fetchdf()
            problems += [(name, p) for p in compare(name, got, exp)]
        assert problems == []


class TestRound5ReviewFindings:
    """Regression pins for the round-5 self-review findings: negative-id
    planted signatures, all-null query vectors, all-null leading row
    groups for dim inference."""

    def test_simhash_plant_negative_ids_match_duckdb(
        self, ray_session, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        duckdb = pytest.importorskip("duckdb")

        from tools.check_correctness import compare, to_pandas

        from pii_detection_test_ray.pipelines.queries import QUERIES
        from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [-7, -3, 0, 3, 7, None, 12, 15], pa.int64()
                    ),
                    "text": pa.array(["x"] * 8, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        got = to_pandas(QUERIES["simhash_pairs"](str(tmp_path)))
        exp = con.execute(ORACLES["simhash_pairs"]).fetchdf()
        assert compare("simhash_pairs", got, exp) == []
        # |−3| and |3| share a signature: the pair must exist on both
        # sides at hamming 0 (abs-plant contract).
        assert ((got["id_a"] == -3) & (got["id_b"] == 3)).any()

    def test_knn_queries_all_null_embeddings(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pii_detection_test_ray.pipelines.queries import QUERIES

        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(
                        [None, None, None], pa.list_(pa.float32())
                    ),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        knn = QUERIES["knn_cosine"](str(tmp_path)).take_all()
        assert knn == []
        ivf = QUERIES["knn_ivf"](str(tmp_path)).take_all()
        assert ivf == []
        # dim inference survives an all-null table too (falls back, no
        # vectors ever reach the matmul).
        pairs = QUERIES["embedding_dup_pairs"](str(tmp_path)).take_all()
        assert pairs == []
