"""Stream-shaped operators (tumbling windows, sessionization, per-group
top-k) and the reference-JSON corpus importer."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _event_rows():
    base = datetime(2024, 5, 1, 10, 0, 0)
    rows = []
    # user 1: two sessions (gap of 2 hours between event 2 and 3)
    for m in (0, 10, 130, 140):
        rows.append({"user_id": 1, "event_type": "click", "ts": base + timedelta(minutes=m), "value": 1.5})
    # user 2: one session
    for m in (0, 20, 40):
        rows.append({"user_id": 2, "event_type": "view", "ts": base + timedelta(minutes=m), "value": 0.25})
    return rows


def test_tumbling_window(ray_session):
    from pii_detection_test_ray.stages.windows import tumbling_window_agg

    ds = ray.data.from_items(_event_rows(), override_num_blocks=2)
    out = tumbling_window_agg(ds).take_all()
    by = {(r["event_type"], r["window_start"].hour): r for r in out}
    assert by[("click", 10)]["n_events"] == 2
    assert by[("click", 12)]["n_events"] == 2
    assert by[("view", 10)]["n_events"] == 3
    assert by[("view", 10)]["total_value_micros"] == 750_000


def test_sessionize(ray_session):
    from pii_detection_test_ray.stages.windows import sessionize

    ds = ray.data.from_items(_event_rows(), override_num_blocks=2)
    out = {r["user_id"]: r for r in sessionize(ds).take_all()}
    assert out[1]["n_sessions"] == 2 and out[1]["n_events"] == 4
    assert out[2]["n_sessions"] == 1 and out[2]["n_events"] == 3


def _brute_sessions(rows, gap_minutes=30):
    """Pure-Python sessionize oracle."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in rows:
        by_key[r["user_id"]].append(r["ts"])
    out = {}
    for k, tss in by_key.items():
        tss.sort()
        n = 1 + sum(
            1
            for a, b in zip(tss, tss[1:])
            if (b - a) > timedelta(minutes=gap_minutes)
        )
        out[k] = (n, len(tss))
    return out


def test_sessionize_skewed_key(ray_session):
    """One user holds ~all events across many days — the hot key that would
    pin a single reducer. The two-stage shape splits it across time windows;
    sessions that span the window cut (including across EMPTY windows) merge
    back in the boundary pass. span_hours=1 maximizes cut crossings."""
    from pii_detection_test_ray.stages.windows import sessionize

    base = datetime(2024, 5, 1)
    rows = []
    # hot user: event every 25 min (continuous 1-session chain crossing
    # every hourly cut), then a 3-day silence, then a second chain
    for i in range(300):
        rows.append({"user_id": 9, "ts": base + timedelta(minutes=25 * i)})
    for i in range(50):
        rows.append(
            {"user_id": 9, "ts": base + timedelta(days=9, minutes=29 * i)}
        )
    # sprinkle of normal users
    for u in range(3):
        rows.append({"user_id": u, "ts": base + timedelta(hours=u)})
    ds = ray.data.from_items(rows, override_num_blocks=8)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(ds, gap_minutes=30, span_hours=1).take_all()
    }
    assert got == _brute_sessions(rows)


def test_running_totals_windowed_matches_plain_under_skew(ray_session):
    """Hot-key running totals: the windowed (default) path must equal the
    single-exchange path row-for-row, including the cross-window offset
    hand-off over empty windows."""
    import random

    from pii_detection_test_ray.stages.windows import running_totals

    rng = random.Random(11)
    base = datetime(2024, 5, 1)
    rows = [
        {
            "event_id": i,
            "user_id": 9 if i % 20 else i,  # 95% of rows on one key
            "ts": base + timedelta(minutes=rng.randint(0, 60 * 24 * 30)),
            "cents": rng.randint(-50, 500),
        }
        for i in range(2000)
    ]
    ds = ray.data.from_items(rows, override_num_blocks=6)
    kw = dict(key_col="user_id", ts_col="ts", val_col="cents", id_col="event_id")
    plain = {
        r["event_id"]: r["cum_cents"]
        for r in running_totals(ds, span_hours=None, **kw).take_all()
    }
    windowed = {
        r["event_id"]: r["cum_cents"]
        for r in running_totals(ds, span_hours=24, **kw).take_all()
    }
    assert len(plain) == 2000
    assert windowed == plain


def test_top_k_per_group(ray_session):
    from pii_detection_test_ray.stages.windows import top_k_per_group

    rows = [
        {"g": "a", "id": i, "score": i * 10} for i in range(5)
    ] + [{"g": "b", "id": i, "score": 100 - i} for i in range(3)]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    out = top_k_per_group(ds, "g", "score", "id", k=2).take_all()
    got = sorted((r["g"], r["rank"], r["id"]) for r in out)
    assert got == [("a", 1, 4), ("a", 2, 3), ("b", 1, 0), ("b", 2, 1)]


REFERENCE_JSON = "/root/reference/combined_test_cases.json"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_JSON), reason="reference corpus not available"
)
def test_read_reference_cases_roundtrip(ray_session):
    """The reference corpus imports into the input_hint shape, documents
    survive HTML wrapping verbatim, and the pipeline scores it with the
    exact same per-category totals as the reference's own regex baseline
    semantics (P/R from BASELINE.md: 64.1 / 42.5)."""
    from pii_detection_test_ray.sources.readers import read_reference_cases
    from pii_detection_test_ray.functions.pii_regex import detect_pii_values
    import json

    pages, labels = read_reference_cases(REFERENCE_JSON)
    rows = pages.take_all()
    assert len(rows) == labels.num_rows == 300
    cases = {c["id"]: c for c in json.load(open(REFERENCE_JSON, encoding="utf-8"))}
    # Document text is embedded verbatim in the extracted page text.
    for row, case_id in zip(rows[:50], labels.column("case_id").to_pylist()[:50]):
        assert cases[case_id]["document_text"] in row["text"]


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_JSON), reason="reference corpus not available"
)
def test_reference_corpus_regex_baseline_metrics():
    """Scoring the imported reference corpus with the engine's detector and
    the reference's own regex-path scoring convention (expected built from
    raw subtype labels WITHOUT normalization — regex_pii_detector.py:346-351)
    reproduces the reference benchmark exactly: running
    run_regex_benchmark on the shipped combined corpus yields
    P 64.3 / R 42.7 / F1 51.3 with 137/300 perfect (the BASELINE.md
    64.1/42.5/51.1 row was published from a slightly older corpus state)."""
    import json

    from pii_detection_test_ray.functions.pii_regex import (
        PII_CATEGORIES,
        detect_pii_values,
    )

    cases = json.load(open(REFERENCE_JSON, encoding="utf-8"))
    total_tp = total_fp = total_fn = 0
    perfect = 0
    for tc in cases:
        pred = detect_pii_values(tc["document_text"])
        expected: dict[str, list[str]] = {}
        for item in tc.get("expected_pii", []):
            expected.setdefault(item["type"], []).append(item["value"])
        tp = fp = fn = 0
        for cat in PII_CATEGORIES:
            e, p = set(expected.get(cat, [])), set(pred.get(cat) or [])
            tp += len(e & p)
            fp += len(p - e)
            fn += len(e - p)
        total_tp += tp
        total_fp += fp
        total_fn += fn
        prec = tp / (tp + fp) if tp + fp else 1.0
        rec = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        perfect += round(f1, 4) == 1.0  # reference rounds per-case f1 (:375)
    precision = total_tp / (total_tp + total_fp)
    recall = total_tp / (total_tp + total_fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert round(precision * 100, 1) == 64.3
    assert round(recall * 100, 1) == 42.7
    assert round(f1 * 100, 1) == 51.3
    assert perfect == 137


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_JSON), reason="reference corpus not available"
)
def test_distributed_pipeline_reproduces_reference_detector(ray_session):
    """End-to-end on the reference's own corpus: JSON import → HTML wrap →
    distributed pipeline (extract → models → gate → detect/scrub) must
    produce, per document, the exact value lists the reference detector
    produces on the extracted page text."""
    import importlib.util
    import json

    from pii_detection_test_ray.functions.pii_regex import (
        CATEGORY_SLUGS,
        PII_CATEGORIES,
    )
    from pii_detection_test_ray.pipelines.quality_filter import build_pipeline
    from pii_detection_test_ray.sources.readers import read_reference_cases

    spec = importlib.util.spec_from_file_location(
        "refdet", "/root/reference/regex_pii_detector.py"
    )
    refdet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refdet)

    pages, labels = read_reference_cases(REFERENCE_JSON)
    out = build_pipeline(pages.map_batches(lambda t: t.drop_columns(["text", "lang"]), batch_format="pyarrow")).take_all()
    by_url = {r["url"]: r for r in out}
    assert len(by_url) == 300
    mismatches = []
    for row in out:
        expected = refdet.detect_pii_regex(row["text"])
        for cat in PII_CATEGORIES:
            got = row[f"pii_{CATEGORY_SLUGS[cat]}"]
            got = list(got) if got is not None else None
            if got != expected[cat]:
                mismatches.append((row["url"], cat))
    assert mismatches == []


def test_read_jsonl_pages_normalizes_to_input_hint(ray_session, tmp_path):
    """Crawl-dump JSONL with missing/variant fields lands as the exact
    input_hint schema and flows through the flagship pipeline."""
    import json

    import pyarrow as pa

    from pii_detection_test_ray.sources.readers import read_jsonl_pages

    # Types are consistent WITHIN a file (what real crawl dumps look like;
    # Arrow JSON inference requires it) but differ ACROSS files.
    iso_lines = [
        {"url": "https://a.com/1", "warc_ts": "2024-03-01T10:00:00",
         "html": "<html><body>hello one</body></html>", "lang": "en",
         "text": "hello one"},
        {"url": "https://a.com/3"},                       # bare url
        {"text": "no url — dropped"},
    ]
    epoch_lines = [
        {"url": "https://a.com/2", "warc_ts": 1709287200,
         "text": "text only page"},                      # no html, epoch ts
    ]
    p1 = tmp_path / "pages_iso.jsonl"
    p1.write_text("\n".join(json.dumps(l) for l in iso_lines))
    p2 = tmp_path / "pages_epoch.jsonl"
    p2.write_text("\n".join(json.dumps(l) for l in epoch_lines))
    ds = read_jsonl_pages(str(p1)).union(read_jsonl_pages(str(p2)))
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(blocks)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"
    assert t.num_rows == 3  # url-less line dropped
    rows = {r["url"]: r for r in t.to_pylist()}
    assert rows["https://a.com/1"]["html"].startswith(b"<html>")
    assert rows["https://a.com/2"]["warc_ts"].year == 2024
    assert rows["https://a.com/3"]["text"] is None


def test_read_jsonl_pages_hostile_timestamps(ray_session, tmp_path):
    """Real crawl dumps carry ISO variants ('Z', offsets, fractional
    seconds), WARC 14-digit stamps, fractional epochs and garbage — each
    parses or nulls the FIELD, never kills the task (round-3 advice)."""
    import datetime
    import json

    from pii_detection_test_ray.sources.readers import read_jsonl_pages

    str_lines = [
        {"url": "u1", "warc_ts": "2024-03-01T10:00:00Z"},
        {"url": "u2", "warc_ts": "2024-03-01T19:00:00+09:00"},  # = 10:00 UTC
        {"url": "u3", "warc_ts": "2024-03-01T10:00:00.123456"},
        {"url": "u4", "warc_ts": "20240301100000"},
        {"url": "u5", "warc_ts": "2024-03-01 10:00:00"},
        {"url": "u6", "warc_ts": "last tuesday"},  # unparseable → null
        # Malformed near-misses (round-4 advice): the fractional-seconds
        # strip is anchored, so these must NULL, never collapse into a
        # 14-digit WARC form and parse as a wrong instant.
        {"url": "u7", "warc_ts": "202403011000.00"},
        {"url": "u8", "warc_ts": "2024.0301100000"},
        {"url": "u9", "warc_ts": "20240301100000.5"},  # WARC + fraction: ok
    ]
    float_lines = [
        {"url": "f1", "warc_ts": 1709287200.25},  # sub-second epoch fraction
    ]
    p1 = tmp_path / "s.jsonl"
    p1.write_text("\n".join(json.dumps(l) for l in str_lines))
    p2 = tmp_path / "f.jsonl"
    p2.write_text("\n".join(json.dumps(l) for l in float_lines))
    rows = {
        r["url"]: r["warc_ts"]
        for r in read_jsonl_pages(str(p1)).union(read_jsonl_pages(str(p2))).take_all()
    }
    utc10 = datetime.datetime(2024, 3, 1, 10, 0, 0)
    assert rows["u1"] == utc10
    assert rows["u2"] == utc10  # offset normalized to the UTC instant
    assert rows["u3"] == utc10  # fractional seconds stripped
    assert rows["u4"] == utc10
    assert rows["u5"] == utc10
    assert rows["u6"] is None
    assert rows["u7"] is None  # 12-digit + fraction: malformed, not WARC
    assert rows["u8"] is None  # dot inside the date: malformed
    assert rows["u9"] == utc10  # true WARC stamp with a fraction
    assert rows["f1"] == utc10.replace(microsecond=250000)


def test_windowed_per_key_operators_tolerate_null_ts(ray_session):
    """Null timestamps sort LAST within their key (the SQL window-order
    convention the DuckDB oracles use, via _ts_us_filled's sentinel) in
    sessionize and BOTH running_totals paths — the lenient crawl reader
    produces null ts by design, so the default windowed paths must not
    crash on them (round-4 review finding), and the null-events corpus
    DuckDB compare pins the exact cross-engine values."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.windows import running_totals, sessionize

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array(
                [datetime(2024, 1, 1), None, datetime(2024, 1, 2)],
                pa.timestamp("us"),
            ),
            "cents": pa.array([5, 7, 9], pa.int64()),
            "event_id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    sess = {r["user_id"]: r["n_events"] for r in sessionize(ds, "user_id", "ts").take_all()}
    assert sess == {1: 2, 2: 1}
    kw = dict(key_col="user_id", ts_col="ts", val_col="cents", id_col="event_id")
    windowed = {
        r["event_id"]: r["cum_cents"]
        for r in running_totals(ds, span_hours=24, **kw).take_all()
    }
    plain = {
        r["event_id"]: r["cum_cents"]
        for r in running_totals(ds, span_hours=None, **kw).take_all()
    }
    # null ts sorts LAST within its key on both paths (SQL NULLS LAST)
    assert windowed == plain == {1: 5, 2: 12, 3: 9}
