"""Result writers (S3/S4) and hybrid merge-policy evaluation (F5)."""

from __future__ import annotations

import json
import os

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def rows_and_corpus(ray_session, small_corpus):
    from pii_detection_test_ray.pipelines.quality_filter import build_pipeline
    from pii_detection_test_ray.stages.eval_agg import metric_rows

    ds = build_pipeline(f"{small_corpus}/documents").materialize()
    rows = metric_rows(ds, f"{small_corpus}/labels.parquet").materialize()
    return ds, rows


def test_write_results_summary(rows_and_corpus, tmp_path):
    from pii_detection_test_ray.pipelines.writers import write_results

    _, rows = rows_and_corpus
    out = str(tmp_path / "results_out")
    summary = write_results(rows, out, config={"corpus": "smoke"})
    assert os.path.isdir(f"{out}/results")
    on_disk = json.load(open(f"{out}/summary.json"))
    assert on_disk["summary"]["micro_f1"] == summary["summary"]["micro_f1"]
    assert summary["summary"]["micro_precision"] >= 0.99


def test_difficulty_split(rows_and_corpus, tmp_path):
    from pii_detection_test_ray.pipelines.writers import write_difficulty_split

    _, rows = rows_and_corpus
    out = str(tmp_path / "split_out")
    summaries = write_difficulty_split(rows, out)
    assert set(summaries) == {"base", "advanced"}
    # partition dirs exist
    bands = sorted(os.listdir(f"{out}/by_difficulty"))
    assert any("base" in b for b in bands) and any("advanced" in b for b in bands)
    # EASY-only band must outperform the advanced band (obfuscation docs).
    assert summaries["base"]["accuracy"] >= summaries["advanced"]["accuracy"]


def test_merge_policy_comparison(rows_and_corpus, small_corpus):
    from pii_detection_test_ray.pipelines.hybrid import policy_comparison

    ds, _ = rows_and_corpus
    rows = policy_comparison(ds, f"{small_corpus}/labels.parquet").take_all()
    by_policy = {r["policy"]: r for r in rows}
    assert set(by_policy) == {
        "union", "primary_only", "secondary_only", "backfill", "smart_account",
        "cross_validated", "tiered", "strong_else_backfill",
        "account_conditional",
    }
    # The corpus plants rare-surname names the classifier rejects (corpus
    # family _doc_name_rare), so primary_only LOSES real names and the
    # union with raw regex restores them — recall strictly improves and the
    # comparison is non-vacuous. All policies keep high precision here
    # (the planted rare names are real, so regex has no FP on them).
    assert by_policy["union"]["recall"] > by_policy["primary_only"]["recall"]
    # Strategy C treats 이름 as a weak category (never union) → tiered
    # tracks primary_only, not union, on a corpus whose only divergence
    # is the name category. Backfill DOES rescue (the classifier empties
    # the whole category on rare-name docs) → tracks union.
    assert by_policy["tiered"]["recall"] == by_policy["primary_only"]["recall"]
    assert by_policy["backfill"]["recall"] == by_policy["union"]["recall"]
    for r in rows:
        assert r["precision"] >= 0.95
        assert r["n_docs"] > 0


def test_learned_policies(rows_and_corpus, small_corpus):
    """Strategies A/F: category sets learned from a first distributed pass
    (per-category rollup of the base policies), then scored like any other
    policy."""
    from pii_detection_test_ray.pipelines.hybrid import (
        learned_policies,
        per_category_policy_rollup,
        policy_comparison,
    )

    ds, _ = rows_and_corpus
    labels = f"{small_corpus}/labels.parquet"
    rollup = per_category_policy_rollup(ds, labels).take_all()
    assert {r["policy"] for r in rollup} == {
        "primary_only", "secondary_only", "union"
    }
    # 3 policies × 12 categories
    assert len(rollup) == 36

    extra = learned_policies(ds, labels)
    assert set(extra) == {"high_precision_union", "f1_improving_union"}
    rows = policy_comparison(ds, labels, extra_policies=extra).take_all()
    by_policy = {r["policy"]: r for r in rows}
    assert "high_precision_union" in by_policy
    # A learned-union policy never drops primary predictions → recall is at
    # least primary_only's.
    assert (
        by_policy["high_precision_union"]["recall"]
        >= by_policy["primary_only"]["recall"]
    )
    assert (
        by_policy["f1_improving_union"]["f1"]
        >= 0.0
    )


def test_write_report_and_charts(rows_and_corpus, tmp_path):
    """S6/S7: markdown+HTML report and chart-data artifacts over the metric
    rows (PNG rendering is matplotlib-gated; JSON specs always written)."""
    import json as _json

    from pii_detection_test_ray.pipelines.writers import write_charts, write_report

    _, rows = rows_and_corpus
    out = str(tmp_path / "report_out")
    sec = write_report(rows, out)
    assert os.path.isfile(f"{out}/report.md") and os.path.isfile(f"{out}/report.html")
    md = open(f"{out}/report.md", encoding="utf-8").read()
    assert "## Per-category metrics" in md and "이메일" in md
    assert len(sec["by_category"]) == 12
    assert "<table>" in open(f"{out}/report.html", encoding="utf-8").read()

    files = write_charts(rows, out, sections=sec)  # reuses report rollups
    assert {os.path.basename(f) for f in files} >= {
        "f1_by_category.json", "difficulty_accuracy.json", "confusion_grid.json"
    }
    spec = _json.load(open(f"{out}/charts/f1_by_category.json", encoding="utf-8"))
    assert len(spec["labels"]) == 12 and len(spec["values"]) == 12


def test_streaming_consumers(rows_and_corpus, tmp_path):
    """iter_batches-based consumers: bounded-memory summary, JSONL export,
    and the generic per-batch hook, all over the flagship output."""
    import io

    from pii_detection_test_ray.pipelines.consume import (
        stream_foreach_batch,
        stream_jsonl,
        stream_summary,
    )

    ds, _ = rows_and_corpus
    summary = stream_summary(ds, batch_size=32)
    assert summary["n_docs"] == 160
    assert summary["n_kept"] + summary["n_dropped"] == summary["n_docs"]
    assert summary["total_pii_spans"] > 0
    assert "ko" in summary["docs_by_lang"]

    buf = io.StringIO()
    n = stream_jsonl(ds, buf, columns=["url", "keep"], batch_size=64)
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert n == 160 and len(lines) == 160
    first = json.loads(lines[0])
    assert set(first) == {"url", "keep"}

    seen = []
    rows = stream_foreach_batch(ds, lambda b: seen.append(b.num_rows), batch_size=50)
    assert rows == 160 and sum(seen) == 160 and max(seen) <= 50
