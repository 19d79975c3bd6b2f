"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time/watermark machinery (and neither does the
reference — SURVEY.md §2.9); these treat the input as a partitioned log:
partition by key, sort by timestamp *within each group only* (the ordering
assumption each operator documents), never a global sort.

* ``tumbling_window_agg`` — fixed windows via timestamp truncation: a plain
  derived column + groupby, no per-key ordering needed at all.
* ``sessionize`` / ``top_k_per_group`` — per-key logic run per coarse HASH
  BUCKET of the key, not per key: one ``map_groups`` task per bucket
  lexsorts thousands of keys at once and does the per-key work with numpy
  boundary masks (the asof/dedup coarse-bucket pattern — a per-key
  ``map_groups`` pays Python+Arrow overhead per key, ≈ms × 10^9 keys).
  Partitioning assumption: one bucket (~128 MiB of input) fits a reducer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _finalize_window_agg(agg: "ray.data.Dataset") -> "ray.data.Dataset":
    """Shared post-aggregate finalizer for the window operators: re-cast
    window_start to timestamp[us] AFTER the exchange (it may re-infer at
    seconds precision; DuckDB date_trunc/time_bucket are [us] and the
    driver's value hash is dtype-sensitive) and rename the value sum."""

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.set_column(
            batch.column_names.index("window_start"),
            "window_start",
            pc.cast(batch.column("window_start"), pa.timestamp("us")),
        )
        return batch.rename_columns(
            [
                {"value_micros": "total_value_micros"}.get(c, c)
                for c in batch.column_names
            ]
        )

    return agg.map_batches(clean, batch_format="pyarrow")


def tumbling_window_agg(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "hour",
) -> ray.data.Dataset:
    """Rows: (key, window_start, n_events, total_value_micros). Window
    assignment is a stateless per-row truncation (``floor_temporal``), so
    this is shuffle-light: one groupby over (key, window) partials."""

    def assign(batch: pa.Table) -> pa.Table:
        # Cast to microsecond precision: DuckDB's date_trunc returns
        # TIMESTAMP (us); a datetime64[s] column here would be value-equal
        # but dtype-different, failing the driver's typed value hash.
        starts = pc.cast(
            pc.floor_temporal(batch.column(ts_col), unit=window),
            pa.timestamp("us"),
        )
        micros = pc.cast(
            # half_towards_infinity = DuckDB round() (half away from zero),
            # not pyarrow's banker's default — keeps ties hash-identical.
            pc.round(
                pc.multiply(batch.column(value_col), 1_000_000.0), 0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": starts,
                "value_micros": micros,
            }
        )

    from .shuffle import partial_groupby_sum

    # (key, window) cardinality grows with the stream — the combiner +
    # coarse-bucket reduce keeps it off Ray's per-key sort-aggregate.
    agg = partial_groupby_sum(
        ds.map_batches(assign, batch_format="pyarrow"),
        [key_col, "window_start"],
        ["value_micros"],
        count_as="n_events",
    )

    return _finalize_window_agg(agg)


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Rows: (key, n_sessions, n_events). A new session starts when the gap
    since the key's previous event exceeds ``gap_minutes``.

    One task per hash bucket of the key (not per key): inside, keys
    factorize, one lexsort by (key, ts) orders every key's events at once,
    and session starts are a single boundary-or-gap mask — per-key Python
    cost is gone. Partitioning assumption: one bucket's events fit one
    reducer (a single pathological key would need day-bucketed sub-keys)."""
    from .asof import _num_buckets_for
    from ..functions.hashing import bucket_ids

    gap_us = gap_minutes * 60 * 1_000_000
    num_buckets = _num_buckets_for(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        from ..functions.hashing import sorted_codes

        ts = (
            pc.cast(pc.cast(group.column(ts_col), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # Dense-rank codes: null-safe, no float64 coercion of int keys
        # (np.unique collapsed distinct ids > 2^53 when a null was present).
        code = sorted_codes(group.column(key_col))
        _, first_idx = np.unique(code, return_index=True)
        order = np.lexsort((ts, code))
        c_s, t_s = code[order], ts[order]
        new_key = np.r_[True, c_s[1:] != c_s[:-1]]
        gap_break = np.r_[True, (t_s[1:] - t_s[:-1]) > gap_us]
        starts = new_key | gap_break
        n_sessions = np.bincount(c_s, weights=starts).astype(np.int64)
        n_events = np.bincount(c_s).astype(np.int64)
        return pa.table(
            {
                key_col: group.column(key_col).take(
                    pa.array(first_idx, pa.int64())
                ),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def top_k_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int = 3,
    descending: bool = True,
) -> ray.data.Dataset:
    """First-k rows per group under (order_col desc|asc, id_col asc) — the
    reference's per-category sample display shape (O4,
    hybrid_analysis.py:243-251), generalized. Emits (group, id, order, rank).

    One task per hash bucket of the group key: group/order/id columns all
    factorize to dense codes (so string order/id columns sort fine), one
    lexsort ranks every group's rows at once, and a rank-within-run mask
    keeps the first k — no per-group Python call."""
    from .asof import _num_buckets_for
    from ..functions.hashing import bucket_ids

    num_buckets = _num_buckets_for(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(group_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        from ..functions.hashing import sorted_codes

        # Dense-rank codes are order-isomorphic to values (nulls first),
        # so code-level comparison == value-level comparison for any dtype
        # — including null strings and int64 ids beyond 2^53.
        code = sorted_codes(group.column(group_col))
        o_code = sorted_codes(group.column(order_col))
        i_code = sorted_codes(group.column(id_col))
        ordkey = -o_code if descending else o_code
        sort_idx = np.lexsort((i_code, ordkey, code))
        c_s = code[sort_idx]
        starts = np.r_[True, c_s[1:] != c_s[:-1]]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        rank0 = np.arange(n) - run_start
        keep = rank0 < k
        take = pa.array(sort_idx[keep], pa.int64())
        kept = group.select([group_col, id_col, order_col]).take(take)
        return kept.append_column(
            "rank", pa.array(rank0[keep] + 1, pa.int64())
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def running_totals(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Per-key cumulative running sum ordered by (ts, id) — the window
    aggregate ``SUM(val) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)``. Emits one row per input row
    (id, key, cum_<val>).

    Same physical shape as ``sessionize``: one task per hash bucket of the
    key, keys factorize, ONE lexsort orders every key's rows at once, and
    the per-key cumulative sum is a whole-bucket ``np.cumsum`` minus each
    run's starting offset — no per-key Python. Partitioning assumption
    (documented like the siblings): one bucket's rows fit one reducer."""
    from .asof import _num_buckets_for
    from ..functions.hashing import bucket_ids

    num_buckets = _num_buckets_for(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    out_val = f"cum_{val_col}"

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ts = (
            pc.cast(pc.cast(group.column(ts_col), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        from ..functions.hashing import sorted_codes

        ids = sorted_codes(group.column(id_col))
        vals = group.column(val_col).to_numpy(zero_copy_only=False)
        code = sorted_codes(group.column(key_col))
        order = np.lexsort((ids, ts, code))
        c_s = code[order]
        v_s = vals[order]
        cs = np.cumsum(v_s)
        starts = np.r_[True, c_s[1:] != c_s[:-1]]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        offset = cs[run_start] - v_s[run_start]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                id_col: group.column(id_col).take(take),
                key_col: group.column(key_col).take(take),
                out_val: pa.array(cs - offset, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def hopping_window_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    length_minutes: int = 60,
    hop_minutes: int = 30,
) -> ray.data.Dataset:
    """Hopping (overlapping) window aggregate: windows of ``length`` start
    every ``hop``; an event lands in ``length/hop`` windows. The map side
    replicates each event once per covering window (vectorized integer
    arithmetic on µs — no temporal kernels in the hot path), then the
    combiner + coarse-bucket reduce folds (key, window_start) cells —
    replication factor is the constant length/hop, never data-dependent.
    ``length`` must be a multiple of ``hop`` (checked)."""
    if length_minutes % hop_minutes:
        raise ValueError("length_minutes must be a multiple of hop_minutes")
    n_windows = length_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    from .shuffle import partial_groupby_sum

    def assign(batch: pa.Table) -> pa.Table:
        ts = (
            pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        micros = (
            pc.cast(
                pc.round(
                    pc.multiply(batch.column(value_col), 1_000_000.0), 0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
        )
        base = (ts // hop_us) * hop_us
        keys = batch.column(key_col)
        parts = []
        for k in range(n_windows):
            starts = base - k * hop_us
            parts.append(
                pa.table(
                    {
                        key_col: keys,
                        "window_start": pa.array(starts, pa.int64()),
                        "value_micros": pa.array(micros, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    agg = partial_groupby_sum(
        ds.map_batches(assign, batch_format="pyarrow"),
        [key_col, "window_start"],
        ["value_micros"],
        count_as="n_events",
    )

    return _finalize_window_agg(agg)
