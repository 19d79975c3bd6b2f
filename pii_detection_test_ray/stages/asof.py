"""Distributed as-of join: for each left row, the LATEST right row of the
same key with right_ts ≤ left_ts (DuckDB ``ASOF JOIN`` semantics — the
operator the reference stack lacks entirely; SURVEY §2.9 extension).

Plan shape: both sides are tagged and union'd under a padded common schema,
then ONE ``groupby(key)`` co-locates each key's rows from both sides; inside
``map_groups`` the right rows are sorted by timestamp once and every left
timestamp binary-searches into them (numpy ``searchsorted`` — O((n+m) log m)
per key, fully vectorized).

Partitioning assumption (documented like ``sessionize``): one key's rows fit
one reducer. At 100 TB with pathological keys, split the key into coarse
time buckets and replicate each bucket's last-known right row into the next
bucket's group — the standard boundary hand-off; not needed for web-log key
cardinalities.

Determinism: when several right rows share (key, ts), the one sorted last
wins locally, but cross-engine agreement is undefined in SQL — dedupe the
right side first (e.g. keep the max-id row per (key, ts)) when hash-parity
with an oracle matters; ``latest_per_key_ts`` below does exactly that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _ts_to_i64(arr) -> np.ndarray:
    """Timestamp/int column → int64 numpy (timestamps in microseconds)."""
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    inner: bool = True,
) -> ray.data.Dataset:
    """Columns out = left's ∪ right's value columns (right's key/ts drop).
    ``inner=False`` keeps unmatched left rows with nulls (ASOF LEFT JOIN)."""
    l_schema, r_schema = left.schema(), right.schema()
    # A dataset can be empty AND schema-less (e.g. a row-filter that dropped
    # everything): degrade gracefully instead of crashing on .names.
    if l_schema is None:
        return left  # no left rows → no output rows
    if r_schema is None:
        # No right rows: inner join is empty; left join passes rows through
        # (the right value columns are untyped-unknowable here, so omitted).
        return left.limit(0) if inner else left
    left_cols = list(l_schema.names)
    r_value_cols = [c for c in r_schema.names if c not in (key, right_ts)]
    overlap = set(left_cols) & set(r_value_cols)
    if overlap:
        raise ValueError(f"non-key column collision: {overlap}")
    col_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_cols = left_cols + r_value_cols
    rts_type = r_types[right_ts]

    def tag_left(batch: pa.Table) -> pa.Table:
        for c in r_value_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows, r_types[c]))
        batch = batch.select(all_cols)
        return batch.append_column(
            "__rts", pa.nulls(batch.num_rows, rts_type)
        ).append_column("__is_r", pa.array([False] * batch.num_rows, pa.bool_()))

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in all_cols:
            if c == key:
                cols[c] = batch.column(key).cast(col_types[key])
            elif c in r_value_cols:
                cols[c] = batch.column(c)
            else:
                cols[c] = pa.nulls(batch.num_rows, col_types[c])
        out = pa.table(cols)
        return out.append_column("__rts", batch.column(right_ts)).append_column(
            "__is_r", pa.array([True] * batch.num_rows, pa.bool_())
        )

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def join_key_group(group: pa.Table) -> pa.Table:
        is_r = group.column("__is_r")
        l_rows = group.filter(pc.invert(is_r))
        r_rows = group.filter(is_r)
        l_out = l_rows.select(left_cols)
        if r_rows.num_rows == 0:
            if inner:
                return group.slice(0, 0).select(all_cols)
            out = l_out
            for c in r_value_cols:
                out = out.append_column(c, pa.nulls(out.num_rows, r_types[c]))
            return out.select(all_cols)
        rts = _ts_to_i64(r_rows.column("__rts").combine_chunks())
        order = np.argsort(rts, kind="stable")
        rts_sorted = rts[order]
        lts = _ts_to_i64(l_rows.column(left_ts).combine_chunks())
        idx = np.searchsorted(rts_sorted, lts, side="right") - 1
        matched = idx >= 0
        if inner:
            l_out = l_out.filter(pa.array(matched))
            take_idx = order[idx[matched]]
            r_match = r_rows.take(pa.array(take_idx, pa.int64()))
            out = l_out
            for c in r_value_cols:
                out = out.append_column(c, r_match.column(c))
            return out.select(all_cols)
        # left join: null value columns where unmatched
        take_idx = order[np.where(matched, idx, 0)]
        r_match = r_rows.take(pa.array(take_idx, pa.int64()))
        valid = pa.array(matched)
        out = l_out
        for c in r_value_cols:
            vals = pc.if_else(
                valid, r_match.column(c).combine_chunks(),
                pa.nulls(len(matched), r_types[c]),
            )
            out = out.append_column(c, vals)
        return out.select(all_cols)

    return tagged.groupby(key).map_groups(join_key_group, batch_format="pyarrow")


def latest_per_key_ts(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
) -> ray.data.Dataset:
    """One row per (key, ts): the max-``tiebreak_col`` row — the
    deterministic right-side dedup an oracle-verifiable as-of join needs
    (composite keys are fine-grained → no reducer skew)."""

    def keep_max(group: pa.Table) -> pa.Table:
        tb = group.column(tiebreak_col)
        idx = pc.index(tb, pc.max(tb).as_py()).as_py()
        return group.slice(idx, 1)

    return ds.groupby([key, ts_col]).map_groups(keep_max, batch_format="pyarrow")
