"""Join operators beyond the broadcast pattern.

* ``bucketed_hash_join`` — large ⋈ large: both sides get a deterministic
  ``bucket = blake2b(key) % B`` column; one groupby co-locates each bucket's
  rows from both sides (tagged by a side column); the pairwise join runs
  inside ``map_groups`` with pandas merge. This is the explicit partitioned
  hash join (no reliance on Dataset.join availability); B is the unit of
  parallelism and skew spread — salt hot keys into sub-buckets by raising B.
* ``semi_join_filter`` / ``anti_join_filter`` — small key side broadcast as
  a set via ``ray.put`` (a Bloom filter at real scale); the big side is
  filtered inside ``map_batches`` with zero shuffle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray
import ray.data


def _bucket_of(value, num_buckets: int) -> int:
    return (
        int.from_bytes(
            hashlib.blake2b(str(value).encode(), digest_size=4).digest(), "big"
        )
        % num_buckets
    )


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Inner join on ``key``. Output columns = left ∪ right (right's key
    column dropped). Both inputs must share only the key column name."""
    l_schema, r_schema = left.schema(), right.schema()
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"non-key column collision: {overlap}")
    col_types = {
        name: typ for name, typ in zip(l_schema.names, l_schema.types)
    }
    col_types.update(
        {name: typ for name, typ in zip(r_schema.names, r_schema.types)}
    )

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            buckets = [
                _bucket_of(v, num_buckets) for v in batch.column(key).to_pylist()
            ]
            return batch.append_column(
                "__bucket", pa.array(buckets, pa.int32())
            ).append_column("__side", pa.array([side] * batch.num_rows, pa.string()))

        return fn

    # Union of tagged sides; missing columns filled with nulls so the union
    # schema is consistent.
    all_cols = left_cols + [c for c in right_cols if c != key]

    def pad(cols_present: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            for c in all_cols:
                if c not in cols_present:
                    batch = batch.append_column(
                        c, pa.nulls(batch.num_rows, col_types[c])
                    )
            # Consistent column order for the union.
            return batch.select(all_cols + ["__bucket", "__side"])

        return fn

    lt = left.map_batches(tag("L"), batch_format="pyarrow").map_batches(
        pad(left_cols), batch_format="pyarrow"
    )
    rt = right.map_batches(tag("R"), batch_format="pyarrow").map_batches(
        pad(right_cols), batch_format="pyarrow"
    )

    out_schema = pa.schema([(c, col_types[c]) for c in all_cols])

    def join_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        l_df = df[df["__side"] == "L"][left_cols]
        r_df = df[df["__side"] == "R"][[key] + [c for c in right_cols if c != key]]
        joined = l_df.merge(r_df, on=key, how="inner")
        # pandas upcasts int64-with-nulls (the union padding) to float64;
        # cast back to the declared types so the integer-exactness contract
        # survives the join.
        return pa.Table.from_pandas(
            joined[all_cols], preserve_index=False
        ).cast(out_schema)

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def semi_join_filter(
    big: ray.data.Dataset, keys, key_col: str
) -> ray.data.Dataset:
    """Keep big-side rows whose key is in ``keys`` (broadcast set)."""
    key_ref = ray.put(frozenset(keys))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(key_ref)
        mask = [v in wanted for v in batch.column(key_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return big.map_batches(keep, batch_format="pyarrow")


def anti_join_filter(
    big: ray.data.Dataset, keys, key_col: str
) -> ray.data.Dataset:
    """Keep big-side rows whose key is NOT in ``keys`` (broadcast set)."""
    key_ref = ray.put(frozenset(keys))

    def keep(batch: pa.Table) -> pa.Table:
        unwanted = ray.get(key_ref)
        mask = [v not in unwanted for v in batch.column(key_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return big.map_batches(keep, batch_format="pyarrow")
