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


# Null timestamps sort LAST within their key (SQL window-function NULLS
# LAST order — the DuckDB oracles' semantics), via a huge-but-arithmetic-
# safe µs sentinel: all null rows share one far-future time window, diffs
# against real timestamps stay well inside int64. One constant shared
# with the as-of join (same convention, same cross-engine contract).
from .asof import _TS_NULL_SENTINEL_US  # noqa: E402


def _ts_us_filled(col) -> "np.ndarray":
    """Timestamp column → int64 µs numpy with nulls as the NULLS-LAST
    sentinel. Without the fill, int64-with-null becomes float64 NaN in
    numpy and the window-id cast raises (the lenient crawl reader emits
    null ts by design)."""
    ts = pc.fill_null(
        pc.cast(col, pa.timestamp("us")),
        pa.scalar(_TS_NULL_SENTINEL_US, pa.timestamp("us")),
    )
    return ts.cast(pa.int64()).to_numpy(zero_copy_only=False)


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
    span_hours: int = 24,
) -> ray.data.Dataset:
    """Rows: (key, n_sessions, n_events). A new session starts when the gap
    since the key's previous event exceeds ``gap_minutes``.

    Hot-key-safe two-stage shape (the sub-bucketing the round-3 docstring
    promised): stage 1 buckets by hash(key, ts // span) — a pathological
    key with 10^9 events spreads across its time windows instead of landing
    in one reducer — and reduces each (key, window) run to a partial
    (first_ts, last_ts, n_starts, n_events) with one lexsort per bucket.
    Stage 2 exchanges only those partials (≤ one row per key per window),
    sorts each key's windows by time and subtracts a session for every
    window boundary the gap spans (a session crossing N windows was counted
    N times). Per-reducer memory is one window of one bucket's keys in
    stage 1 and one bucket of partials in stage 2 — no single key can pin a
    reducer. Within-stage work is numpy masks; per-key Python cost is gone."""
    from .asof import _num_buckets_for
    from ..functions.hashing import bucket_ids_multi

    gap_us = gap_minutes * 60 * 1_000_000
    span_us = span_hours * 3600 * 1_000_000
    num_buckets = _num_buckets_for(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = _ts_us_filled(batch.column(ts_col))
        win = pa.array(ts // span_us, pa.int64())
        out = batch.select([key_col, ts_col]).append_column("__win", win)
        b = bucket_ids_multi([batch.column(key_col), win], num_buckets)
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    def partial_bucket(group: pa.Table) -> pa.Table:
        from ..functions.hashing import sorted_codes

        if group.num_rows == 0:
            empty = pa.array([], pa.int64())
            return pa.table(
                {
                    key_col: group.column(key_col),
                    "first_ts": empty,
                    "last_ts": empty,
                    "n_starts": empty,
                    "n_events": empty,
                }
            )
        ts = _ts_us_filled(group.column(ts_col))
        code = sorted_codes(group.column(key_col))
        win = group.column("__win").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, win, code))
        c_s, w_s, t_s = code[order], win[order], ts[order]
        new_run = np.r_[True, (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1])]
        gap_break = np.r_[True, (t_s[1:] - t_s[:-1]) > gap_us]
        starts = new_run | gap_break
        run_id = np.cumsum(new_run) - 1
        first_idx = np.flatnonzero(new_run)
        last_idx = np.r_[first_idx[1:] - 1, len(order) - 1]
        return pa.table(
            {
                key_col: group.column(key_col).take(
                    pa.array(order[first_idx], pa.int64())
                ),
                "first_ts": pa.array(t_s[first_idx], pa.int64()),
                "last_ts": pa.array(t_s[last_idx], pa.int64()),
                "n_starts": pa.array(
                    np.bincount(run_id, weights=starts).astype(np.int64), pa.int64()
                ),
                "n_events": pa.array(np.bincount(run_id).astype(np.int64), pa.int64()),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        from ..functions.hashing import sorted_codes

        if group.num_rows == 0:
            return pa.table(
                {
                    key_col: group.column(key_col),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        code = sorted_codes(group.column(key_col))
        first = group.column("first_ts").to_numpy(zero_copy_only=False)
        last = group.column("last_ts").to_numpy(zero_copy_only=False)
        starts = group.column("n_starts").to_numpy(zero_copy_only=False)
        events = group.column("n_events").to_numpy(zero_copy_only=False)
        order = np.lexsort((first, code))
        c_s = code[order]
        new_key = np.r_[True, c_s[1:] != c_s[:-1]]
        # A session spanning the window cut was counted once per side:
        # subtract one wherever a key's next window starts within the gap.
        # The null-timestamp window (first_ts = sentinel) also never starts
        # a session when the key has earlier real events — SQL semantics:
        # `NULL - prev > gap` is NULL, not a session break.
        bridged = ~new_key & (
            ((first[order] - np.r_[0, last[order][:-1]]) <= gap_us)
            | (first[order] >= _TS_NULL_SENTINEL_US)
        )
        _, key_first = np.unique(c_s, return_index=True)
        n_sessions = (
            np.bincount(c_s, weights=starts[order])
            - np.bincount(c_s, weights=bridged)
        ).astype(np.int64)
        n_events = np.bincount(c_s, weights=events[order]).astype(np.int64)
        return pa.table(
            {
                key_col: group.column(key_col).take(
                    pa.array(order[key_first], pa.int64())
                ),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(partial_bucket, batch_format="pyarrow")
    )
    from ..functions.hashing import bucket_ids

    def rebucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    return (
        partials.map_batches(rebucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
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

        if n == 0:
            return group.select([group_col, id_col, order_col]).append_column(
                "rank", pa.array([], pa.int64())
            )
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
    span_hours: int | None = 24,
) -> ray.data.Dataset:
    """Per-key cumulative running sum ordered by (ts, id) — the window
    aggregate ``SUM(val) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)``. Emits one row per input row
    (id, key, cum_<val>). ``val_col`` must be integer (the engine-wide
    integer-exactness contract).

    Default path (``span_hours`` set) is hot-key-safe: rows co-locate by
    hash(key, ts // span) so a pathological key spreads across its time
    windows; a combiner pass sums each (key, window) cell, a tiny per-key
    exchange turns the window totals into exclusive prefix offsets (the
    cumulative hand-off), and the final bucket task seats each window's
    offset row first in its run and adds it to the in-window cumsum. Costs
    one extra scan of ``ds`` (the combiner pass) vs the single-exchange
    path — prefer a parquet-backed or checkpointed input.

    ``span_hours=None`` is the cheaper single-exchange path (one task per
    key hash bucket, one lexsort + np.cumsum) with the documented
    assumption that no single key outgrows a reducer."""
    if span_hours is not None:
        return _running_totals_windowed(
            ds, key_col, ts_col, val_col, id_col, span_hours
        )
    from .asof import _num_buckets_for
    from ..functions.hashing import bucket_ids

    num_buckets = _num_buckets_for(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    out_val = f"cum_{val_col}"

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ts = _ts_us_filled(group.column(ts_col))
        from ..functions.hashing import sorted_codes

        ids = sorted_codes(group.column(id_col))
        # null values add nothing to the running sum (SQL SUM skips NULLs;
        # the row itself still gets a cum value)
        vals = pc.fill_null(group.column(val_col), 0).to_numpy(
            zero_copy_only=False
        )
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


def _running_totals_windowed(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    span_hours: int,
) -> ray.data.Dataset:
    """Hot-key-safe running_totals (see its docstring for the plan shape)."""
    from .asof import _num_buckets_for
    from .shuffle import partial_groupby_sum
    from ..functions.hashing import bucket_ids, bucket_ids_multi

    span_us = span_hours * 3600 * 1_000_000
    num_buckets = _num_buckets_for(ds)
    out_val = f"cum_{val_col}"
    sch = ds.schema().base_schema
    id_type = sch.field(id_col).type
    key_type = sch.field(key_col).type

    def tag(batch: pa.Table) -> pa.Table:
        # NULLS-LAST sentinel (not epoch 0): null-ts rows must sort after
        # their key's real events, like the plain path and the SQL oracle
        ts = pc.fill_null(
            pc.cast(batch.column(ts_col), pa.timestamp("us")),
            pa.scalar(_TS_NULL_SENTINEL_US, pa.timestamp("us")),
        )
        win = pa.array(
            ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // span_us,
            pa.int64(),
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                ts_col: ts,
                val_col: batch.column(val_col).cast(pa.int64()),
                "__win": win,
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # Window totals per (key, window): combiner exchange, ≤ one row per
    # cell per block — the only all-rows pass besides the final one.
    cells = partial_groupby_sum(tagged, [key_col, "__win"], [val_col])

    def offsets_bucket(group: pa.Table) -> pa.Table:
        from ..functions.hashing import sorted_codes

        if group.num_rows == 0:
            return pa.table(
                {
                    key_col: group.column(key_col),
                    "__win": pa.array([], pa.int64()),
                    "__off": pa.array([], pa.int64()),
                }
            )
        code = sorted_codes(group.column(key_col))
        win = group.column("__win").to_numpy(zero_copy_only=False)
        # an all-null-value cell sums to null — it contributes 0 offset
        tot = pc.fill_null(group.column(val_col), 0).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((win, code))
        c_s, t_s = code[order], tot[order]
        cs = np.cumsum(t_s)
        n = len(order)
        starts = np.r_[True, c_s[1:] != c_s[:-1]]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        excl = cs - t_s  # prefix sum excluding self
        off = excl - excl[run_start]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                key_col: group.column(key_col).take(take),
                "__win": pa.array(win[order], pa.int64()),
                "__off": pa.array(off, pa.int64()),
            }
        )

    def bucket_cells(batch: pa.Table) -> pa.Table:
        b = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    offsets = (
        cells.map_batches(bucket_cells, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(offsets_bucket, batch_format="pyarrow")
    )

    # Final pass: rows ∪ offset rows co-located by hash(key, window); the
    # offset row seats first in its (key, window) run and hands its value
    # to the in-window cumsum.
    union_cols = [id_col, key_col, ts_col, val_col, "__win", "__off", "__is_off"]

    def tag_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.append_column("__off", pa.nulls(n, pa.int64())).append_column(
            "__is_off", pa.array(np.zeros(n, dtype=bool))
        )
        b = bucket_ids_multi([out.column(key_col), out.column("__win")], num_buckets)
        return out.select(union_cols).append_column("__bucket", pa.array(b, pa.int32()))

    def tag_offsets(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.table(
            {
                id_col: pa.nulls(n, id_type),
                key_col: batch.column(key_col),
                ts_col: pa.nulls(n, pa.timestamp("us")),
                val_col: pa.array(np.zeros(n, dtype=np.int64)),
                "__win": batch.column("__win"),
                "__off": batch.column("__off"),
                "__is_off": pa.array(np.ones(n, dtype=bool)),
            }
        )
        b = bucket_ids_multi([out.column(key_col), out.column("__win")], num_buckets)
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    def final_bucket(group: pa.Table) -> pa.Table:
        from ..functions.hashing import sorted_codes

        is_off = group.column("__is_off").to_numpy(zero_copy_only=False)
        if group.num_rows == 0 or bool(is_off.all()):
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    key_col: pa.array([], key_type),
                    out_val: pa.array([], pa.int64()),
                }
            )
        code = sorted_codes(group.column(key_col))
        win = group.column("__win").to_numpy(zero_copy_only=False)
        ts = (
            pc.fill_null(group.column(ts_col), pa.scalar(0, pa.timestamp("us")))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.fill_null(group.column(val_col), 0)
            .to_numpy(zero_copy_only=False)
        )
        off = (
            pc.fill_null(group.column("__off"), 0)
            .to_numpy(zero_copy_only=False)
        )
        id_code = sorted_codes(group.column(id_col))
        n = group.num_rows
        order = np.lexsort((id_code, ts, (~is_off).view(np.int8), win, code))
        c_s, w_s, v_s = code[order], win[order], v[order]
        cs = np.cumsum(v_s)
        new_run = np.r_[True, (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1])]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        cum = cs - cs[run_start] + off[order][run_start]
        keep = ~is_off[order]
        take = pa.array(order[keep], pa.int64())
        return pa.table(
            {
                id_col: group.column(id_col).take(take),
                key_col: group.column(key_col).take(take),
                out_val: pa.array(cum[keep], pa.int64()),
            }
        )

    unioned = tagged.map_batches(tag_rows, batch_format="pyarrow").union(
        offsets.map_batches(tag_offsets, batch_format="pyarrow")
    )
    return unioned.groupby("__bucket").map_groups(
        final_bucket, batch_format="pyarrow"
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
        ts = _ts_us_filled(batch.column(ts_col))
        valid = pc.is_valid(
            pc.cast(batch.column(ts_col), pa.timestamp("us"))
        )
        micros = pc.cast(
            pc.round(
                pc.multiply(batch.column(value_col), 1_000_000.0), 0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        base = (ts // hop_us) * hop_us
        keys = batch.column(key_col)
        parts = []
        for k in range(n_windows):
            # a null ts lands in a NULL window_start on every replica —
            # SQL's time_bucket(NULL) semantics (the rows still count
            # length/hop times under the null window, as UNION ALL does)
            starts = pc.if_else(
                valid,
                pa.array(base - k * hop_us, pa.int64()),
                pa.scalar(None, pa.int64()),
            )
            parts.append(
                pa.table(
                    {
                        key_col: keys,
                        "window_start": starts,
                        "value_micros": micros,
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
