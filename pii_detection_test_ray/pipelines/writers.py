"""Result sinks: partitioned Parquet writers + run summaries.

Reimplements the reference's output layer as Dataset sinks (reference:
run_pii_evaluation.py:1100-1172, split_existing_results.py:16-86):

* ``write_results`` (S3) — full run output as partitioned Parquet + a small
  driver-side ``summary.json`` (the reference's results JSON header:
  model/config/timestamp/summary).
* ``write_difficulty_split`` (S4) — the base (EASY) vs advanced
  (MEDIUM+HARD) split, each with its own recomputed summary; implemented as
  one pass with ``difficulty_band`` as the partition column, not two scans.

Surrogate sanitation (reference: run_pii_evaluation.py:1100-1108) is a
non-issue here: text flows through Arrow UTF-8 columns which cannot hold
unpaired surrogates; the scrub stage normalizes at the string boundary.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray.data


def _summarize(rows: ray.data.Dataset) -> dict:
    from ..stages.eval_agg import global_micro

    return global_micro(rows)


def write_results(
    metric_rows: ray.data.Dataset,
    out_dir: str,
    config: dict | None = None,
) -> dict:
    """Write per-(doc,category) metric rows as Parquet plus summary.json.
    Returns the summary dict."""
    os.makedirs(out_dir, exist_ok=True)
    metric_rows = metric_rows.materialize()
    metric_rows.write_parquet(os.path.join(out_dir, "results"))
    summary = {
        "engine": "pii_detection_test_ray",
        "config": config or {},
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "summary": _summarize(metric_rows),
    }
    with open(os.path.join(out_dir, "summary.json"), "w", encoding="utf-8") as f:
        json.dump(summary, f, ensure_ascii=False, indent=2)
    return summary


def add_difficulty_band(batch: pa.Table) -> pa.Table:
    """EASY → base; MEDIUM/HARD → advanced (reference difficulty split,
    run_pii_evaluation.py:1166-1172)."""
    bands = [
        "base" if d == "EASY" else "advanced"
        for d in batch.column("difficulty").to_pylist()
    ]
    return batch.append_column("difficulty_band", pa.array(bands, pa.string()))


def write_difficulty_split(
    metric_rows: ray.data.Dataset, out_dir: str
) -> dict[str, dict]:
    """One partitioned write (band = partition column) + per-band recomputed
    summaries, mirroring the `_base` / `_advanced` output files."""
    os.makedirs(out_dir, exist_ok=True)
    banded = metric_rows.map_batches(
        add_difficulty_band, batch_format="pyarrow"
    ).materialize()
    banded.write_parquet(
        os.path.join(out_dir, "by_difficulty"), partition_cols=["difficulty_band"]
    )
    summaries: dict[str, dict] = {}
    for band in ("base", "advanced"):
        subset = banded.map_batches(
            lambda t, b=band: t.filter(
                pa.compute.equal(t.column("difficulty_band"), b)
            ),
            batch_format="pyarrow",
        )
        summaries[band] = _summarize(subset)
    with open(os.path.join(out_dir, "split_summaries.json"), "w", encoding="utf-8") as f:
        json.dump(summaries, f, ensure_ascii=False, indent=2)
    return summaries


# ---------------------------------------------------------------------------
# S6 report writer / S7 chart writer
# ---------------------------------------------------------------------------


def _report_sections(metric_rows: ray.data.Dataset) -> dict:
    """All report inputs in distributed passes; each result is output-sized
    (≤ categories × difficulties rows) before it reaches the driver."""
    from ..stages.eval_agg import (
        confusion_by_pii_category,
        global_micro,
        rollup_by_difficulty,
        rollup_by_pii_category,
        worst_failures,
    )

    metric_rows = metric_rows.materialize()
    return {
        "summary": global_micro(metric_rows),
        "by_category": sorted(
            rollup_by_pii_category(metric_rows).take_all(),
            key=lambda r: (-r["f1"], r["pii_category"]),
        ),
        "by_difficulty": sorted(
            rollup_by_difficulty(metric_rows).take_all(),
            key=lambda r: r["difficulty"],
        ),
        "confusion": sorted(
            confusion_by_pii_category(metric_rows).take_all(),
            key=lambda r: r["pii_category"],
        ),
        "worst": worst_failures(metric_rows, k=10).take_all(),
    }


def _md_table(rows: list[dict], cols: list[str]) -> str:
    head = "| " + " | ".join(cols) + " |"
    sep = "|" + "|".join("---" for _ in cols) + "|"
    body = "\n".join(
        "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |" for r in rows
    )
    return "\n".join([head, sep, body])


def write_report(
    metric_rows: ray.data.Dataset,
    out_dir: str,
    title: str = "PII evaluation report",
    sections: dict | None = None,
) -> dict:
    """S6 (reference: generate_report.py:130-728): evaluation report over the
    metric rows — summary cards, per-category table, difficulty table,
    binary confusion matrix, worst failures — written as ``report.md`` plus
    a minimal static ``report.html`` (tables only, no JS). All aggregation
    is distributed; the driver renders a few dozen rows. Pass ``sections``
    (this function's return value) to reuse rollups across writers."""
    os.makedirs(out_dir, exist_ok=True)
    sec = sections if sections is not None else _report_sections(metric_rows)
    s = sec["summary"]
    md = [
        f"# {title}",
        "",
        f"_Generated {time.strftime('%Y-%m-%d %H:%M:%S')}_",
        "",
        "## Summary",
        "",
        _md_table(
            [
                {"metric": "documents", "value": s["n_docs"]},
                {"metric": "perfect documents", "value": s["n_perfect"]},
                {"metric": "accuracy", "value": s["accuracy"]},
                {"metric": "micro precision", "value": s["micro_precision"]},
                {"metric": "micro recall", "value": s["micro_recall"]},
                {"metric": "micro F1", "value": s["micro_f1"]},
            ],
            ["metric", "value"],
        ),
        "",
        "## Per-category metrics",
        "",
        _md_table(
            sec["by_category"],
            ["pii_category", "tp", "fp", "fn", "precision", "recall", "f1"],
        ),
        "",
        "## By difficulty",
        "",
        _md_table(
            sec["by_difficulty"],
            ["difficulty", "n_docs", "n_perfect", "accuracy", "precision",
             "recall", "f1"],
        ),
        "",
        "## Binary presence confusion (per category)",
        "",
        _md_table(
            sec["confusion"],
            ["pii_category", "bin_tp", "bin_tn", "bin_fp", "bin_fn"],
        ),
        "",
        "## Worst documents (micro-F1 ascending)",
        "",
        _md_table(
            sec["worst"], ["url", "category", "difficulty", "micro_f1"]
        ),
        "",
    ]
    md_text = "\n".join(md)
    with open(os.path.join(out_dir, "report.md"), "w", encoding="utf-8") as f:
        f.write(md_text)

    rows_html = []
    for block in md_text.split("\n\n"):
        if block.startswith("|"):
            lines = [l for l in block.splitlines() if not set(l) <= {"|", "-"}]
            cells = [
                [c.strip() for c in line.strip("|").split("|")] for line in lines
            ]
            header = "".join(f"<th>{c}</th>" for c in cells[0])
            body = "".join(
                "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                for row in cells[1:]
            )
            rows_html.append(
                f"<table><thead><tr>{header}</tr></thead><tbody>{body}</tbody></table>"
            )
        elif block.startswith("# "):
            rows_html.append(f"<h1>{block[2:]}</h1>")
        elif block.startswith("## "):
            rows_html.append(f"<h2>{block[3:]}</h2>")
        else:
            rows_html.append(f"<p>{block}</p>")
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title>"
        "<style>body{font-family:sans-serif;max-width:960px;margin:24px auto;}"
        "table{border-collapse:collapse;margin:8px 0;}"
        "td,th{border:1px solid #ccc;padding:4px 10px;font-size:13px;}"
        "th{background:#f0f2f5;}</style></head><body>"
        + "".join(rows_html)
        + "</body></html>"
    )
    with open(os.path.join(out_dir, "report.html"), "w", encoding="utf-8") as f:
        f.write(html)
    return sec


def write_charts(
    metric_rows: ray.data.Dataset,
    out_dir: str,
    sections: dict | None = None,
) -> list[str]:
    """S7 (reference: generate_charts.py:128-437): chart outputs over the
    metric rows. The data series (per-category F1 bars, base-vs-advanced
    grouped bars, confusion heatmap grid) are computed distributed and
    always written as ``charts/*.json``; PNG rendering additionally runs
    when matplotlib is importable (absent in this container — the JSON is
    the portable artifact). Returns the list of files written. Pass
    ``sections`` (write_report's return value) to avoid recomputing the
    five distributed rollups when writing report + charts together."""
    charts_dir = os.path.join(out_dir, "charts")
    os.makedirs(charts_dir, exist_ok=True)
    sec = sections if sections is not None else _report_sections(metric_rows)
    written: list[str] = []

    specs = {
        "f1_by_category": {
            "kind": "barh",
            "title": "Per-category F1",
            "labels": [r["pii_category"] for r in sec["by_category"]],
            "values": [r["f1"] for r in sec["by_category"]],
        },
        "difficulty_accuracy": {
            "kind": "grouped_bar",
            "title": "Accuracy / F1 by difficulty",
            "labels": [r["difficulty"] for r in sec["by_difficulty"]],
            "series": {
                "accuracy": [r["accuracy"] for r in sec["by_difficulty"]],
                "f1": [r["f1"] for r in sec["by_difficulty"]],
            },
        },
        "confusion_grid": {
            "kind": "heatmap",
            "title": "Binary presence confusion",
            "rows": [r["pii_category"] for r in sec["confusion"]],
            "cols": ["bin_tp", "bin_tn", "bin_fp", "bin_fn"],
            "cells": [
                [r["bin_tp"], r["bin_tn"], r["bin_fp"], r["bin_fn"]]
                for r in sec["confusion"]
            ],
        },
    }
    for name, spec in specs.items():
        path = os.path.join(charts_dir, f"{name}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(spec, f, ensure_ascii=False, indent=2)
        written.append(path)

    try:  # pragma: no cover - matplotlib absent in this container
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, spec in specs.items():
            fig, ax = plt.subplots(figsize=(9, 6))
            if spec["kind"] == "barh":
                ax.barh(spec["labels"], spec["values"])
            elif spec["kind"] == "grouped_bar":
                import numpy as np

                x = np.arange(len(spec["labels"]))
                n = len(spec["series"])
                for i, (label, vals) in enumerate(spec["series"].items()):
                    ax.bar(x + i * 0.8 / n, vals, width=0.8 / n, label=label)
                ax.set_xticks(x + 0.4 - 0.4 / n, spec["labels"])
                ax.legend()
            else:
                ax.imshow(spec["cells"], aspect="auto")
                ax.set_yticks(range(len(spec["rows"])), spec["rows"])
                ax.set_xticks(range(len(spec["cols"])), spec["cols"])
            ax.set_title(spec["title"])
            fig.tight_layout()
            png = os.path.join(charts_dir, f"{name}.png")
            fig.savefig(png, dpi=120)
            plt.close(fig)
            written.append(png)
    except ImportError:
        pass
    return written
