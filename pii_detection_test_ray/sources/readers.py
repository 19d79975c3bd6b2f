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
