"""Skew-aware shuffle patterns: partial (combiner) aggregation and salted
groupby.

A bare ``groupby(key).aggregate(...)`` ships every row to its key's
partition; at 10^12 rows a hot key (one page duplicated a million times, one
dominant language) melts a single reducer. Two standard fixes, both
implemented here as reusable Dataset transforms:

* ``partial_groupby_sum`` — combine inside ``map_batches`` first (one output
  row per key per batch), then run the real ``groupby`` over partials only.
  The shuffle moves O(keys × blocks) rows instead of O(rows).
* ``salted_keep_min`` — two-stage reduction for keep-one-per-group dedup: a
  first groupby on ``(key, salt)`` (salt = hash(id) % num_salts splits any
  hot key across reducers), then a second groupby on ``key`` over the ≤
  num_salts survivors. No reducer ever sees more than ~|group|/num_salts
  rows of a hot key.

Sums are integers end-to-end, so both rewrites are bit-identical to the
naive groupby (verified against the DuckDB oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def partial_groupby_sum(
    ds: ray.data.Dataset,
    key_cols: list[str],
    sum_cols: list[str],
    count_as: str | None = None,
) -> ray.data.Dataset:
    """groupby(key_cols) with per-batch combining. Output columns:
    key_cols + sum_cols (summed) [+ count_as]. Equivalent to
    ``groupby(keys).aggregate(Sum(...), Count())`` but the shuffle carries
    only per-batch partials."""

    def combine(batch: pa.Table) -> pa.Table:
        # Arrow's C++ hash aggregate is the whole combiner — no per-row
        # Python. Sums stay int64 (integer-exactness contract) and key
        # types survive as declared, including on an empty batch.
        aggs = [(c, "sum") for c in sum_cols]
        if count_as:
            aggs.append(([], "count_all"))
        grouped = (
            batch.select(key_cols + sum_cols).group_by(key_cols).aggregate(aggs)
        )
        renames = {f"{c}_sum": c for c in sum_cols}
        if count_as:
            renames["count_all"] = count_as
        grouped = grouped.rename_columns(
            [renames.get(c, c) for c in grouped.column_names]
        )
        arrays = {k: grouped.column(k) for k in key_cols}
        for c in sum_cols:
            arrays[c] = grouped.column(c).cast(pa.int64())
        if count_as:
            arrays[count_as] = grouped.column(count_as).cast(pa.int64())
        return pa.table(arrays)

    partials = ds.map_batches(combine, batch_format="pyarrow")
    # Final reduce via the coarse-bucket pattern instead of Ray's
    # sort-aggregate: bucketing the composite key down to ``num_buckets``
    # int32 values makes the exchange a cheap small-key sort, and ONE
    # Arrow C++ group_by per bucket folds the partials. Measured ~13× on
    # the pair aggregate this pattern was lifted from; distinct-key
    # cardinality never hits Ray's per-key sort machinery.
    from ..functions.hashing import bucket_ids_multi

    all_sums = sum_cols + ([count_as] if count_as else [])
    num_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids_multi(
            [batch.column(k) for k in key_cols], num_buckets
        )
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        g = (
            group.select(key_cols + all_sums)
            .group_by(key_cols)
            .aggregate([(c, "sum") for c in all_sums])
        )
        arrays = {k: g.column(k) for k in key_cols}
        for c in all_sums:
            arrays[c] = g.column(f"{c}_sum").cast(pa.int64())
        return pa.table(arrays)

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def salted_keep_min(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    num_salts: int = 16,
) -> ray.data.Dataset:
    """Keep the min-``id_col`` row per ``key_col`` group, hot-key-safe.

    Stage 1 groups by (key, salt) — a duplicated-everywhere key is split
    across ``num_salts`` reducers, each keeping one local survivor. Stage 2
    groups the survivors by key alone (≤ num_salts rows per key, bounded)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import bucket_ids

        # Deterministic salt from the id so re-runs shard identically;
        # seed=1 keeps the salt stream independent of any bucket tag that
        # may be derived from the same column elsewhere in the plan.
        salts = bucket_ids(batch.column(id_col), num_salts, seed=1)
        return batch.append_column("__salt", pa.array(salts, pa.int32()))

    stage1 = _keep_min_bucketed(
        ds.map_batches(add_salt, batch_format="pyarrow"),
        [key_col, "__salt"],
        id_col,
    ).drop_columns(["__salt"])
    return _keep_min_bucketed(stage1, [key_col], id_col)


def _keep_min_bucketed(
    ds: ray.data.Dataset,
    group_cols: list[str],
    id_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """First (min-id) row per ``group_cols`` group via the coarse-bucket
    pattern: composite-hash the group key to ``num_buckets`` int32 values
    (cheap small-key exchange — never a sort over distinct keys), then ONE
    lexsort per bucket marks every group's min-id row at once. Replaces
    the per-group ``map_groups`` call that cost one Python invocation per
    distinct key. Memory per reducer is one bucket's rows — salting
    upstream (see ``salted_keep_min``) keeps hot groups split across
    buckets."""
    from ..functions.hashing import bucket_ids_multi

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids_multi(
            [batch.column(c) for c in group_cols], num_buckets
        )
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__b"])
        n = group.num_rows
        if n == 0:
            return group
        from ..functions.hashing import sorted_codes

        # Dense-rank codes: null-safe (nulls group together, SQL-style)
        # and no float64 coercion of int64 keys containing a null.
        codes = [sorted_codes(group.column(c)) for c in group_cols]
        id_code = sorted_codes(group.column(id_col))
        order = np.lexsort((id_code, *reversed(codes)))
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        for c in codes:
            c_s = c[order]
            starts[1:] |= c_s[1:] != c_s[:-1]
        return group.take(pa.array(order[starts], pa.int64()))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def coarse_bucketed_groupby(
    ds: ray.data.Dataset,
    key_cols: list[str],
    aggs: list[tuple[str, str]],
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """The repo's standard high-cardinality reduce, as one named helper:
    composite-hash the key to ``num_buckets`` int32 values (cheap
    small-key exchange) and run ONE Arrow C++ ``group_by(...).aggregate``
    per bucket. ``aggs`` are Arrow (column, fn) pairs — ``[]`` means
    DISTINCT rows over the key columns. Output columns: key_cols +
    ``{col}_{fn}`` per aggregate (Arrow naming). See CLAUDE.md: never
    point Ray's sort-aggregate at a high-cardinality key."""
    from ..functions.hashing import bucket_ids_multi

    cols_needed = list(
        dict.fromkeys(key_cols + [c for c, _ in aggs])
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids_multi(
            [batch.column(c) for c in key_cols], num_buckets
        )
        return batch.select(cols_needed).append_column(
            "__b", pa.array(b, pa.int32())
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["__b"]).group_by(key_cols).aggregate(aggs)
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )
