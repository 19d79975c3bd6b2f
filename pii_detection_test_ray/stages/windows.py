"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time/watermark machinery (and neither does the
reference — SURVEY.md §2.9); these treat the input as a partitioned log:
partition by key, sort by timestamp *within each group only* (the ordering
assumption each operator documents), never a global sort.

* ``tumbling_window_agg`` — fixed windows via timestamp truncation: a plain
  derived column + groupby, no per-key ordering needed at all.
* ``sessionize`` — gap-based sessions per key: ``groupby(key).map_groups``
  sorts one key's events (bounded by per-key volume, the documented
  partitioning assumption) and counts gap-breaks.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


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

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Count(), Sum("value_micros"))
    )

    def clean(batch: pa.Table) -> pa.Table:
        # Re-cast AFTER the aggregate: the shuffle re-infers the key column
        # at seconds precision, but DuckDB's date_trunc is TIMESTAMP (us) and
        # the driver's value hash is dtype-sensitive.
        batch = batch.set_column(
            batch.column_names.index("window_start"),
            "window_start",
            pc.cast(batch.column("window_start"), pa.timestamp("us")),
        )
        return batch.rename_columns(
            [
                {"count()": "n_events", "sum(value_micros)": "total_value_micros"}.get(
                    c, c
                )
                for c in batch.column_names
            ]
        )

    return agg.map_batches(clean, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Rows: (key, n_sessions, n_events). A new session starts when the gap
    since the key's previous event exceeds ``gap_minutes``.

    Partitioning assumption: one key's events fit one reducer (true for web
    logs; a key with unbounded volume would need day-bucketed sub-keys)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def per_key(group: pa.Table) -> pa.Table:
        # timestamps → int64 microseconds, sorted within this key only
        ts = sorted(
            pc.cast(
                pc.cast(group.column(ts_col), pa.timestamp("us")), pa.int64()
            ).to_pylist()
        )
        sessions = 0
        prev = None
        for t in ts:
            if prev is None or t - prev > gap_us:
                sessions += 1
            prev = t
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "n_sessions": pa.array([sessions], pa.int64()),
                "n_events": pa.array([group.num_rows], pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


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
    hybrid_analysis.py:243-251), generalized. Emits (group, id, order, rank)."""

    def head_k(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column(order_col).to_pylist(), group.column(id_col).to_pylist()),
            key=lambda r: ((-r[0]) if descending else r[0], r[1]),
        )[:k]
        n = len(rows)
        return pa.table(
            {
                group_col: pa.concat_arrays(
                    [group.column(group_col).slice(0, 1).combine_chunks()] * n
                )
                if n
                else group.column(group_col).slice(0, 0).combine_chunks(),
                id_col: pa.array([r[1] for r in rows]),
                order_col: pa.array([r[0] for r in rows]),
                "rank": pa.array(list(range(1, n + 1)), pa.int64()),
            }
        )

    return ds.groupby(group_col).map_groups(head_k, batch_format="pyarrow")
