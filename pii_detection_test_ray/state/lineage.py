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
