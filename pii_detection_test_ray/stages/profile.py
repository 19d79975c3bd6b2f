"""Distributed table profiling: per-column row/null counts, min/max,
and approximate distinct cardinality — the data-quality summary every
ingestion pipeline runs before trusting a new drop of data.

Two bounded scans of the SOURCE (not one): the partials pass folds
nulls + HLL registers, and a typed ``ds.aggregate`` computes min/max
(folding rendered strings would order numerics lexicographically).
Profile a table or checkpoint, not an expensive lazy lineage — each
scan re-executes it.

Plan shape: per-batch partials compute every column's stats in one pass
over the batch (Arrow kernels for nulls/min/max, one vectorized HLL
ingest for distincts) and emit ONE ROW PER COLUMN — the exchange is
columns × blocks rows regardless of table size; the driver folds the
bounded partial set (counts add, min/min, max/max, HLL registers merge).
Min/max are rendered to strings so one output schema covers columns of
any type (the profile is a report, not a join input).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.sketches import HyperLogLog


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    hll_precision: int = 12,
) -> pa.Table:
    """(column, n_rows, n_nulls, n_distinct_approx, min_value, max_value)
    — one row per profiled column, exact except the HLL distinct. Reads
    the source twice (see module docstring)."""
    from ..functions.hashing import hash64_column

    schema = ds.schema()
    cols = columns or list(schema.names)

    def partials(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        n_rows: list[int] = []
        n_nulls: list[int] = []
        mins: list[str | None] = []
        maxs: list[str | None] = []
        hlls: list[bytes] = []
        for c in cols:
            col = batch.column(c)
            names.append(c)
            n_rows.append(batch.num_rows)
            n_nulls.append(col.null_count)
            valid = col.drop_null()
            hll = HyperLogLog(hll_precision)
            if len(valid):
                hll.add_hashes(hash64_column(valid))
            hlls.append(hll.registers.tobytes())
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "n_nulls": pa.array(n_nulls, pa.int64()),
                "hll": pa.array(hlls, pa.binary()),
            }
        )

    acc: dict[str, dict] = {
        c: {"n": 0, "nulls": 0, "hll": HyperLogLog(hll_precision)}
        for c in cols
    }
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        a = acc[row["column"]]
        a["n"] += row["n_rows"]
        a["nulls"] += row["n_nulls"]
        other = HyperLogLog.from_bytes(row["hll"], p=hll_precision)
        a["hll"] = a["hll"].merge(other)

    # Min/max in one TYPED aggregate pass (folding rendered strings would
    # order numerics lexicographically); rendered to text only at the end.
    from ray.data.aggregate import Max, Min

    bounds = ds.aggregate(*[agg(c) for c in cols for agg in (Min, Max)])
    for c in cols:
        lo, hi = bounds.get(f"min({c})"), bounds.get(f"max({c})")
        acc[c]["min"] = None if lo is None else str(lo)
        acc[c]["max"] = None if hi is None else str(hi)

    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n_rows": pa.array([acc[c]["n"] for c in cols], pa.int64()),
            "n_nulls": pa.array([acc[c]["nulls"] for c in cols], pa.int64()),
            "n_distinct_approx": pa.array(
                [int(acc[c]["hll"].estimate()) for c in cols], pa.int64()
            ),
            "min_value": pa.array([acc[c]["min"] for c in cols], pa.string()),
            "max_value": pa.array([acc[c]["max"] for c in cols], pa.string()),
        }
    )
