"""Sketch-based distributed aggregation: approximate count-distinct,
quantiles, and heavy hitters.

The mergeable-sketch pattern: one serialized sketch per key per batch (the
combiner), merged in a tiny groupby — the shuffle carries ``keys × blocks``
small sketches instead of every row. This is the scale path;
``q_events_rollup`` keeps the exact count-distinct for oracle comparison.
"""

from __future__ import annotations

import pickle

import pyarrow as pa
import ray.data

from ..functions.sketches import HashSampleQuantile, HyperLogLog, MisraGries


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


def _sketch_per_key(ds, key_col, value_col, make_sketch, finalize_cols):
    """Shared combiner shape: per-batch per-key sketch → serialized bytes →
    groupby(key) merge → finalize_cols(merged) output columns."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sketches: dict = {}
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        for k, v in zip(keys, vals):
            if k not in sketches:
                sketches[k] = make_sketch()
            sketches[k].add(v)
        return pa.table(
            {
                key_col: pa.array(list(sketches.keys())),
                "sketch": pa.array(
                    [pickle.dumps(s) for s in sketches.values()], pa.binary()
                ),
            }
        )

    def merge_group(group: pa.Table) -> pa.Table:
        merged = make_sketch()
        for blob in group.column("sketch").to_pylist():
            merged = merged.merge(pickle.loads(blob))
        cols = {key_col: group.column(key_col).slice(0, 1)}
        cols.update(finalize_cols(merged))
        return pa.table(cols)

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )


def approx_quantiles_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.95, 0.99),
    bits: int = 6,
) -> ray.data.Dataset:
    """Rows: (key, q50, q95, ... float64). Deterministic regardless of
    partitioning (distinct-value-hash sampling — functions/sketches.py)."""

    def finalize(merged: HashSampleQuantile) -> dict:
        return {
            f"q{int(q * 100)}": pa.array(
                [merged.quantile(q)], pa.float64()
            )
            for q in qs
        }

    return _sketch_per_key(
        ds, key_col, value_col, lambda: HashSampleQuantile(bits), finalize
    )


def heavy_hitters_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    k: int = 16,
    top_n: int = 5,
) -> ray.data.Dataset:
    """Rows: (key, hitters: list<string>, hitter_counts: list<int64>) —
    the ``top_n`` most frequent values per key (Misra-Gries lower-bound
    counts; any value with true frequency > n/(k+1) is guaranteed present)."""

    def finalize(merged: MisraGries) -> dict:
        top = merged.top(top_n)
        return {
            "hitters": pa.array([[str(v) for v, _ in top]], pa.list_(pa.string())),
            "hitter_counts": pa.array(
                [[int(c) for _, c in top]], pa.list_(pa.int64())
            ),
        }

    return _sketch_per_key(
        ds, key_col, value_col, lambda: MisraGries(k), finalize
    )
