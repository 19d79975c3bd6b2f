"""Storage-side bucketing: write a table hash-partitioned by a key once,
then join/aggregate bucket-by-bucket with ZERO runtime shuffle — the
Hive-bucketed-join move. At 100 TB the win is structural: a table that is
re-joined or re-grouped on the same key across many pipeline runs pays the
all-to-all exchange once at write time, and every later run streams
aligned bucket pairs (bucket b of the left can only match bucket b of the
right, because both sides used the same ``bucket_ids`` hash).

This is one of the two places the engine drops below the Dataset API on
purpose (the other is the shared dedup index): the per-bucket join is raw
Ray tasks + ``from_arrow_refs``, because the Dataset API cannot express
"these two on-disk partitionings are already aligned — do NOT exchange".

Partitioning assumptions (documented like the other wide operators):
* both sides were written by ``write_bucketed`` with the SAME
  ``num_buckets`` (checked — the writer records it in a manifest);
* bucket alignment relies on ``functions.hashing.bucket_ids``, which
  normalizes integer widths and temporal precisions before hashing, so an
  int32 key on one side and int64 on the other still co-bucket;
* non-key column names must not collide (same contract as the runtime
  bucketed join).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import bucket_ids

_MANIFEST = "_bucketing.json"


def write_bucketed(
    ds: ray.data.Dataset, path: str, key: str, num_buckets: int = 32
) -> str:
    """Write ``ds`` as Hive-partitioned parquet ``path/__bucket=<b>/...``,
    bucketed by ``hash64(key) % num_buckets``, plus a manifest recording
    the bucketing spec so readers can verify alignment."""

    def tag(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["__bucket"]
    )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"key": key, "num_buckets": num_buckets}, f)
    return path


def _read_spec(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def _read_bucket(path: str, b: int) -> pa.Table | None:
    d = os.path.join(path, f"__bucket={b}")
    if not os.path.isdir(d):
        return None
    return pq.read_table(d)


def join_bucketed(
    left_path: str, right_path: str, key: str
) -> ray.data.Dataset:
    """Inner join of two ``write_bucketed`` outputs on their shared key —
    one Ray task per aligned bucket pair, no exchange of any kind. Output
    columns = left ∪ right (right's key dropped, Arrow join semantics)."""
    lspec, rspec = _read_spec(left_path), _read_spec(right_path)
    if lspec != {"key": key, "num_buckets": lspec["num_buckets"]} or rspec != {
        "key": key,
        "num_buckets": lspec["num_buckets"],
    }:
        raise ValueError(
            f"bucketing mismatch: left={lspec} right={rspec} want key={key!r} "
            "and equal num_buckets — rewrite one side with write_bucketed"
        )
    num_buckets = lspec["num_buckets"]

    @ray.remote
    def join_one(b: int) -> pa.Table:
        lt = _read_bucket(left_path, b)
        rt = _read_bucket(right_path, b)
        if lt is None or rt is None or lt.num_rows == 0 or rt.num_rows == 0:
            # empty inner join, but with the joined schema so Ray Data can
            # union the blocks
            lt = lt if lt is not None else pq.read_table(
                _first_bucket_dir(left_path)
            ).slice(0, 0)
            rt = rt if rt is not None else pq.read_table(
                _first_bucket_dir(right_path)
            ).slice(0, 0)
            lt, rt = _align_key_types(lt.slice(0, 0), rt.slice(0, 0), key)
            return lt.join(rt, keys=[key], join_type="inner")
        # pyarrow defaults to LEFT OUTER; this operator is an inner join.
        lt, rt = _align_key_types(lt, rt, key)
        return lt.join(rt, keys=[key], join_type="inner")

    refs = [join_one.remote(b) for b in range(num_buckets)]
    return ray.data.from_arrow_refs(refs)


def _align_key_types(lt: pa.Table, rt: pa.Table, key: str) -> tuple[pa.Table, pa.Table]:
    """Cast both sides' key column to one canonical type before the Arrow
    join. ``bucket_ids`` normalizes integer widths / temporal precisions so
    an int32 key co-BUCKETS with an int64 one, but ``pa.Table.join`` still
    requires equal key types — this closes that gap (int→int64,
    temporal→timestamp[us]); genuinely incompatible families still raise."""
    lf, rf = lt.schema.field(key).type, rt.schema.field(key).type
    if lf == rf:
        return lt, rt
    if pa.types.is_integer(lf) and pa.types.is_integer(rf):
        canon = pa.int64()
    elif (pa.types.is_timestamp(lf) or pa.types.is_date(lf)) and (
        pa.types.is_timestamp(rf) or pa.types.is_date(rf)
    ):
        canon = pa.timestamp("us")
    else:
        raise ValueError(
            f"join key {key!r} has incompatible types: left={lf} right={rf}"
        )

    def recast(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(key)
        return t.set_column(i, key, t.column(key).cast(canon))

    return recast(lt), recast(rt)


def _first_bucket_dir(path: str) -> str:
    for name in sorted(os.listdir(path)):
        if name.startswith("__bucket="):
            return os.path.join(path, name)
    raise FileNotFoundError(f"no bucket partitions under {path}")


def compact_parquet(
    input_dir: str,
    output_dir: str,
    target_mb: int = 256,
) -> dict:
    """Small-file compaction: rewrite a directory of parquet shards into
    ~``target_mb`` files — the storage-maintenance pass a long-lived
    corpus store needs after many incremental appends (metadata pressure
    and per-file open costs grow with file count; readers want few large
    row groups). Discovery is recursive (nested / Hive-partitioned shards
    included); the input is scanned exactly ONCE — the row count comes
    from the written output's parquet footers, not a pre-count pass.
    ``output_dir`` must be fresh (empty/absent — write_parquet APPENDS, so
    a reused dir would mix runs and corrupt the footer-derived stats) and
    must not nest under ``input_dir`` (recursive discovery would re-ingest
    it next run). Returns {files_in, files_out, rows}."""
    in_abs = os.path.abspath(input_dir)
    out_abs = os.path.abspath(output_dir)
    if out_abs == in_abs or out_abs.startswith(in_abs + os.sep):
        raise ValueError(
            f"output_dir {output_dir!r} nests under input_dir {input_dir!r}"
        )
    if os.path.isdir(output_dir) and os.listdir(output_dir):
        raise ValueError(
            f"output_dir {output_dir!r} is not empty — compaction output "
            "must be a fresh directory (writes append, stats would mix runs)"
        )
    files = sorted(
        os.path.join(root, f)
        for root, _dirs, names in os.walk(input_dir)
        for f in names
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet shards under {input_dir!r}")
    total_bytes = sum(os.path.getsize(f) for f in files)
    num_out = max(1, round(total_bytes / (target_mb << 20)))
    ray.data.read_parquet(files).repartition(num_out).write_parquet(output_dir)
    out_files = [
        os.path.join(output_dir, f)
        for f in os.listdir(output_dir)
        if f.endswith(".parquet")
    ]
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in out_files)
    return {"files_in": len(files), "files_out": len(out_files), "rows": n_rows}
