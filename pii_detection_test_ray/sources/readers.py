"""Corpus readers beyond Parquet.

``read_reference_cases`` imports a reference-style JSON test-case corpus
(array of ``{id, category, difficulty, document_text, expected_pii, ...}``
objects — reference: run_pii_evaluation.py:994-1000, pii_test_cases.py:22-30)
into the engine's two-table shape: an input_hint pages Dataset and a labels
table. This is the S1 fixture-import path; the engine itself is
Parquet-first.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pyarrow as pa
import ray.data

from .corpus import render_html
from ..functions.html_text import extract_text


def read_reference_cases(
    json_path: str, url_prefix: str = "https://cases.example-archive.kr"
) -> tuple[ray.data.Dataset, pa.Table]:
    """Returns (pages Dataset with url/warc_ts/html/text/lang, labels Table
    with url/case_id/category/difficulty/expected_pii)."""
    with open(json_path, encoding="utf-8") as f:
        cases = json.load(f)
    base_ts = datetime(2024, 3, 1)
    urls, tss, htmls, texts = [], [], [], []
    l_exp = []
    for i, tc in enumerate(cases):
        html = render_html(tc["document_text"], i, f"case {tc['id']}")
        urls.append(f"{url_prefix}/{tc['id']}")
        tss.append(base_ts + timedelta(seconds=i))
        htmls.append(html)
        texts.append(extract_text(html))
        l_exp.append(
            [
                {"type": item["type"], "value": item["value"]}
                for item in tc.get("expected_pii", [])
            ]
        )
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["ko"] * len(cases), pa.string()),
        }
    )
    labels = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "case_id": pa.array([tc["id"] for tc in cases], pa.string()),
            "category": pa.array([tc.get("category", "") for tc in cases], pa.string()),
            "difficulty": pa.array(
                [tc.get("difficulty", "EASY") for tc in cases], pa.string()
            ),
            "expected_pii": pa.array(
                l_exp,
                pa.list_(pa.struct([("type", pa.string()), ("value", pa.string())])),
            ),
        }
    )
    return ray.data.from_arrow(pages), labels


def _parse_ts_strings(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Lenient ISO-8601-ish parse for crawl-dump timestamps: tries several
    formats (naive ISO, trailing 'Z', numeric UTC offset via %z, space
    separator, WARC 14-digit) and nulls whatever none of them match —
    unparseable timestamps drop the FIELD, never the task. Fractional
    seconds are stripped first (Arrow strptime has no %f) — ANCHORED to a
    seconds field (``:SS.ffff`` or a 14-digit WARC stamp), not a global
    '.digits' strip: '202105011200.00' or '2021.0501120000' are malformed
    inputs that must NULL, not collapse into a 14-digit form and parse
    into a wrong instant (round-4 advice). Offset-bearing strings
    normalize to the UTC instant then land naive like the rest."""
    import pyarrow.compute as pc

    s = pc.replace_substring_regex(col, r"(:[0-9]{2})\.[0-9]+", r"\1")
    s = pc.replace_substring_regex(s, r"^([0-9]{14})\.[0-9]+$", r"\1")
    out = None
    for fmt, tz_aware in [
        ("%Y-%m-%dT%H:%M:%S", False),
        ("%Y-%m-%dT%H:%M:%SZ", False),
        ("%Y-%m-%dT%H:%M:%S%z", True),
        ("%Y-%m-%d %H:%M:%S", False),
        ("%Y%m%d%H%M%S", False),
    ]:
        cand = pc.strptime(s, format=fmt, unit="us", error_is_null=True)
        if tz_aware:
            cand = cand.cast(pa.timestamp("us"))
        out = cand if out is None else pc.coalesce(out, cand)
    return out


_PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def read_jsonl_pages(paths) -> ray.data.Dataset:
    """Web-crawl JSONL ingestion: one JSON object per line with any subset
    of the input_hint fields (``url, warc_ts, html, text, lang``) —
    normalized to the exact input_hint schema so every downstream stage
    sees the contract it was built for, regardless of which crawl dump
    produced the lines.

    Normalization per batch (distributed, Arrow-native where the kernel
    exists): missing columns materialize as typed nulls; ``warc_ts``
    accepts ISO-8601 strings or epoch seconds and lands as
    ``timestamp[us]``; ``html`` utf-8-encodes string payloads to binary.
    Lines missing ``url`` are dropped (a page without its key cannot
    enter the lineage/dedup machinery) — counted per batch, not fatal."""
    import pyarrow.compute as pc

    ds = ray.data.read_json(paths)

    def normalize(batch: pa.Table) -> pa.Table:
        cols: dict = {}
        names = set(batch.column_names)
        n = batch.num_rows
        keep = (
            pc.is_valid(batch.column("url"))
            if "url" in names
            else pa.array([False] * n, pa.bool_())
        )
        batch = batch.filter(keep)
        n = batch.num_rows
        for field in _PAGE_SCHEMA:
            name, typ = field.name, field.type
            if name not in names:
                cols[name] = pa.nulls(n, typ)
                continue
            col = batch.column(name)
            if name == "warc_ts":
                if pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us"))
                elif pa.types.is_integer(col.type) or pa.types.is_floating(
                    col.type
                ):
                    # Sub-second epoch fractions: round to whole µs before the
                    # int64 cast (Arrow refuses truncating float casts), and
                    # null non-finite OR out-of-int64-range values instead of
                    # raising — an absurd epoch (1e30) is a bad FIELD, not a
                    # dead task.
                    us = pc.round(pc.multiply(col.cast(pa.float64()), 1e6))
                    ok = pc.and_(
                        pc.is_finite(us),
                        pc.less(pc.abs(us), pa.scalar(9.2e18, pa.float64())),
                    )
                    us = pc.if_else(ok, us, pa.scalar(None, pa.float64()))
                    col = us.cast(pa.int64()).cast(pa.timestamp("us"))
                else:
                    col = _parse_ts_strings(col.cast(pa.string()))
            elif name == "html" and pa.types.is_string(col.type):
                col = col.cast(pa.binary())
            else:
                col = col.cast(typ)
            cols[name] = col
        return pa.table(cols).cast(_PAGE_SCHEMA)

    return ds.map_batches(normalize, batch_format="pyarrow")
