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
