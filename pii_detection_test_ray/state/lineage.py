"""Per-partition lineage checkpointing → resumable runs.

The reference's only resume mechanism is coarse file-existence skipping per
model (reference: run_all_benchmarks.sh:90-93). At 10^12-document scale a
run must instead resume mid-corpus: here the unit of work is an input shard
(one Parquet file). Each completed shard writes its output under
``out_dir/part-<shard>/`` and then atomically records a manifest entry
(``_lineage/<shard>.json``: input file, row counts, wall time, stage
versions) via write-to-temp + rename. On restart, shards with a manifest
entry are skipped; a shard killed mid-write leaves no manifest and is
reprocessed from its own input only.

Alongside each manifest, per-partition STAGE METRICS are checkpointed to
Parquet (``_metrics/<shard>.parquet``, long format ``shard / metric /
value``): kept/dropped counts, per-reason drop histogram, per-language doc
counts, scrubbed PII/toxic span totals, wall time. ``read_stage_metrics``
loads the whole directory as one table — the health dashboard of a long
run reads this instead of scanning output shards.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable

import ray.data

# Bump when stage semantics change: stale-version manifest entries are
# reprocessed rather than trusted.
PIPELINE_VERSION = "1"


@dataclass
class ShardResult:
    shard: str
    rows_in: int
    rows_out: int
    wall_sec: float
    skipped: bool


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _shard_key(input_file: str) -> str:
    return os.path.splitext(os.path.basename(input_file))[0]


def completed_shards(out_dir: str) -> dict[str, dict]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    done: dict[str, dict] = {}
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name), encoding="utf-8") as f:
            entry = json.load(f)
        if entry.get("pipeline_version") == PIPELINE_VERSION:
            done[entry["shard"]] = entry
    return done


def _record(out_dir: str, entry: dict) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{entry['shard']}.json")
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(entry, f, ensure_ascii=False)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)  # atomic on POSIX


def _metrics_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_metrics")


def _checkpoint_stage_metrics(
    out_dir: str, key: str, part_dir: str, rows_in: int, wall: float
) -> None:
    """Aggregate the group's just-written output into a tiny long-format
    Parquet file (columns: shard, metric, value). Reads back only the five
    metric columns of one group — columnar, cheap at any corpus scale —
    and writes atomically (temp + rename) like the manifest."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    wanted = ["keep", "drop_reasons", "pred_lang", "n_pii_spans", "n_toxic_spans"]
    files = [
        os.path.join(part_dir, n)
        for n in sorted(os.listdir(part_dir))
        if n.endswith(".parquet")
    ]
    metrics: dict[str, float] = {"rows_in": float(rows_in), "wall_sec": round(wall, 3)}
    if files:
        # resumable_run is generic over pipeline_fn: only aggregate the
        # metric columns the output actually has.
        have = set(pq.ParquetFile(files[0]).schema_arrow.names)
        cols = [c for c in wanted if c in have]
        t = pa.concat_tables(pq.read_table(f, columns=cols) for f in files)
        metrics["rows_out"] = float(t.num_rows)
        if "keep" in cols:
            kept = pc.sum(pc.cast(t.column("keep"), pa.int64())).as_py() or 0
            metrics["kept"] = float(kept)
            metrics["dropped"] = float(t.num_rows - kept)
        for col in ("n_pii_spans", "n_toxic_spans"):
            if col in cols:
                key_name = col.removeprefix("n_")
                metrics[key_name] = float(pc.sum(t.column(col)).as_py() or 0)
        histos = []
        if "drop_reasons" in cols:
            histos.append(
                (t.column("drop_reasons").combine_chunks().flatten(), "drop_reason")
            )
        if "pred_lang" in cols:
            histos.append((t.column("pred_lang"), "lang"))
        for part, prefix in histos:
            counts = pa.table({"v": part}).group_by("v").aggregate([("v", "count")])
            for v, c in zip(
                counts.column("v").to_pylist(), counts.column("v_count").to_pylist()
            ):
                metrics[f"{prefix}:{v}"] = float(c)
    else:  # pragma: no cover - empty group
        metrics["rows_out"] = 0.0
    out = pa.table(
        {
            "shard": pa.array([key] * len(metrics), pa.string()),
            "metric": pa.array(list(metrics), pa.string()),
            "value": pa.array(list(metrics.values()), pa.float64()),
        }
    )
    mdir = _metrics_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{key}.parquet")
    tmp = final + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, final)


def read_stage_metrics(out_dir: str):
    """All checkpointed per-partition stage metrics as one pyarrow Table
    (columns shard / metric / value); empty table if none recorded yet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mdir = _metrics_dir(out_dir)
    empty = pa.table(
        {
            "shard": pa.array([], pa.string()),
            "metric": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
        }
    )
    if not os.path.isdir(mdir):
        return empty
    tables = [
        pq.read_table(os.path.join(mdir, n))
        for n in sorted(os.listdir(mdir))
        if n.endswith(".parquet")
    ]
    return pa.concat_tables(tables) if tables else empty


def resumable_run(
    input_files: list[str],
    out_dir: str,
    pipeline_fn: Callable[[list[str]], ray.data.Dataset],
    group_size: int = 8,
) -> list[ShardResult]:
    """Run ``pipeline_fn`` over input shards, skipping completed ones.

    Shards are processed in groups of ``group_size`` files so each Ray Data
    job has enough blocks to parallelize, while the resume granularity stays
    one manifest entry per group. Output is partitioned one directory per
    group — never one giant file.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)
    results: list[ShardResult] = []
    groups = [
        input_files[i : i + group_size] for i in range(0, len(input_files), group_size)
    ]
    for group in groups:
        key = _shard_key(group[0]) + ("" if len(group) == 1 else f"+{len(group) - 1}")
        if key in done:
            e = done[key]
            results.append(
                ShardResult(key, e["rows_in"], e["rows_out"], 0.0, skipped=True)
            )
            continue
        t0 = time.time()
        ds = pipeline_fn(group)
        part_dir = os.path.join(out_dir, f"part-{key}")
        # A reprocessed shard (crash mid-write, stale pipeline version) may
        # leave partial output behind; clear it or the new write APPENDS and
        # every row duplicates.
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        ds.write_parquet(part_dir)
        rows_out = sum(
            f.metadata.num_rows
            for f in _parquet_files(part_dir)
        )
        rows_in = sum(f.metadata.num_rows for f in map(_pq, group))
        wall = time.time() - t0
        _checkpoint_stage_metrics(out_dir, key, part_dir, rows_in, wall)
        _record(
            out_dir,
            {
                "shard": key,
                "inputs": group,
                "pipeline_version": PIPELINE_VERSION,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": round(wall, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )
        results.append(ShardResult(key, rows_in, rows_out, wall, skipped=False))
    return results


def _pq(path: str):
    import pyarrow.parquet as pq

    return pq.ParquetFile(path)


def _parquet_files(directory: str):
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(directory)):
        if name.endswith(".parquet"):
            yield pq.ParquetFile(os.path.join(directory, name))
