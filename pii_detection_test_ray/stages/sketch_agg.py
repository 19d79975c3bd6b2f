"""Sketch-based distributed aggregation: approximate count-distinct.

The mergeable-sketch pattern: one serialized HLL per key per batch (the
combiner), elementwise-max merge in a tiny groupby — the shuffle carries
``keys × blocks`` 4 KiB sketches instead of every row. This is the scale
path for count-distinct; ``q_events_rollup`` keeps the exact version for
oracle comparison.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.sketches import HyperLogLog


def approx_distinct_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Rows: (key, approx_distinct: int64). Deterministic (content hashes)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sketches: dict = {}
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        for k, v in zip(keys, vals):
            if k not in sketches:
                sketches[k] = HyperLogLog(p)
            sketches[k].add(v)
        return pa.table(
            {
                key_col: pa.array(list(sketches.keys())),
                "sketch": pa.array(
                    [s.to_bytes() for s in sketches.values()], pa.binary()
                ),
            }
        )

    def merge_group(group: pa.Table) -> pa.Table:
        merged = HyperLogLog(p)
        for blob in group.column("sketch").to_pylist():
            merged = merged.merge(HyperLogLog.from_bytes(blob, p))
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "approx_distinct": pa.array(
                    [int(round(merged.estimate()))], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )
