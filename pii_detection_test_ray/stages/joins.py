"""Join operators beyond the broadcast pattern.

* ``bucketed_hash_join`` — large ⋈ large: both sides get a deterministic
  ``bucket = hash64(key) % B`` column (vectorized numpy/siphash — see
  ``functions.hashing.bucket_ids``); one groupby co-locates each bucket's
  rows from both sides (tagged by a side column); the pairwise join runs
  inside ``map_groups`` with ``pyarrow.Table.join`` (no pandas round-trip).
  B is the unit of parallelism and skew spread — it is derived from the
  inputs' file sizes when not given (≈ one bucket per 128 MiB of input, at
  least one per CPU), so at 100 TB each join task still sees a bounded slice.
* ``bucketed_semi_join`` / ``bucketed_anti_join`` — exact distributed
  semi/anti join: the filter-key side is bucketed WITH the big side, so the
  key set is never materialized on the driver. One shuffle of the big side.
* ``semi_join_filter`` / ``anti_join_filter`` — zero-shuffle variants for a
  genuinely small, already-collected key side (dim tables), broadcast once
  via ``ray.put``. For fact-sized key sides use the bucketed variants.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import bucket_ids, bucket_of

_TARGET_BUCKET_BYTES = 128 << 20  # ≈ compressed input per join task
# Build sides whose input files are smaller than this are broadcast once via
# ray.put instead of shuffled — the auto-broadcast-join threshold. Unknown
# sizes (non-file sources) conservatively take the shuffle path.
_BROADCAST_THRESHOLD_BYTES = 256 << 20


def _input_bytes(ds: ray.data.Dataset) -> int | None:
    """Compressed bytes of the datasource files (metadata only; never
    executes the plan). None when unknown (e.g. from_items)."""
    total, known = 0, False
    try:
        for f in ds.input_files():
            try:
                total += os.path.getsize(f)
                known = True
            except OSError:
                pass
    except Exception:
        pass
    return total if known else None


# Scalar reference of the vectorized bucket hash (kept under the historical
# name for the pure-Python test oracles that import it).
_bucket_of = bucket_of


def _auto_num_buckets(*sides: ray.data.Dataset) -> int:
    """Size B from input bytes (file metadata only — never executes the
    plan): one bucket per ~128 MiB of input, floored at the CPU count so
    small joins still parallelize, capped so tasks don't become crumbs."""
    total = sum(_input_bytes(ds) or 0 for ds in sides)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    by_size = total // _TARGET_BUCKET_BYTES + 1
    return int(min(65536, max(cpus, by_size)))


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    num_buckets: int | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Join on ``key`` (``inner`` or ``left outer``). Output columns =
    left ∪ right (right's key column dropped; for ``left outer``,
    unmatched left rows carry nulls in the right columns). Both inputs
    must share only the key column name. Bucket alignment means an outer
    join costs exactly what the inner join does — unmatched left rows
    never leave their bucket."""
    if join_type not in ("inner", "left outer"):
        raise ValueError(f"unsupported join_type: {join_type!r}")
    if num_buckets is None:
        num_buckets = _auto_num_buckets(left, right)
    l_schema, r_schema = left.schema(), right.schema()
    # Empty-and-schema-less side (a row-filter dropped everything): the
    # join degrades to an empty result instead of crashing on .names.
    # (For left outer with an unknowable right schema the right columns
    # cannot be padded; the left rows pass through unchanged.)
    if l_schema is None:
        return left
    if r_schema is None:
        return left if join_type == "left outer" else left.limit(0)
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
            buckets = bucket_ids(batch.column(key), num_buckets)
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
    r_sel = [key] + [c for c in right_cols if c != key]

    def join_bucket(group: pa.Table) -> pa.Table:
        # Arrow-native: filter + Table.join, zero pandas conversions — the
        # declared types (and the integer-exactness contract) survive as-is.
        lmask = pc.equal(group.column("__side"), "L")
        l_tbl = group.filter(lmask).select(left_cols)
        r_tbl = group.filter(pc.invert(lmask)).select(r_sel)
        joined = l_tbl.join(r_tbl, keys=key, join_type=join_type)
        return joined.select(all_cols).cast(out_schema)

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def broadcast_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Join (``inner`` or ``left outer``) where the (dim-sized) right side
    is collected once and shipped via ``ray.put``. Handles duplicate right
    keys (row fan-out) and preserves declared column types. Use only when
    the right side is known small — ``hash_join`` routes here below the
    broadcast threshold."""
    if join_type not in ("inner", "left outer"):
        raise ValueError(f"unsupported join_type: {join_type!r}")
    if left.schema() is None:  # schema-less ⇒ no probe rows ⇒ join ∅
        return left
    r_schema = right.schema()
    if r_schema is None:  # schema-less build side: inner ⇒ ∅; outer ⇒ left
        return left if join_type == "left outer" else left.limit(0)
    right_cols = [c for c in r_schema.names if c != key]
    overlap = (set(left.schema().names) & set(r_schema.names)) - {key}
    if overlap:
        raise ValueError(f"non-key column collision: {overlap}")

    # Materialize the build side ONCE as an Arrow table in the object store
    # (block refs, no Python-object round-trip); every probe batch then runs
    # pyarrow's C++ hash join against it — this replaced the last per-row
    # Python dict-lookup loop in the join family.
    pa_schema = pa.schema(list(zip(r_schema.names, r_schema.types)))
    blocks = [b for b in ray.get(right.to_arrow_refs()) if b.num_rows]
    r_tbl = (
        pa.concat_tables([b.select(pa_schema.names).cast(pa_schema) for b in blocks])
        if blocks
        else pa_schema.empty_table()
    ).select([key] + right_cols)
    ref = ray.put(r_tbl)

    def join_batch(batch: pa.Table) -> pa.Table:
        build = ray.get(ref)
        joined = batch.join(build, keys=key, join_type=join_type)
        # Table.join output column order is not guaranteed; restore
        # left ∪ right.
        return joined.select(list(batch.column_names) + right_cols)

    return left.map_batches(join_batch, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    num_buckets: int | None = None,
    broadcast_threshold: int = _BROADCAST_THRESHOLD_BYTES,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Join (``inner`` or ``left outer``) with automatic strategy choice:
    broadcast the right side when its datasource files are under
    ``broadcast_threshold`` (zero shuffle), else the bucketed Arrow hash
    join (both sides distributed). Semantics are identical either way;
    only the exchange plan differs."""
    rb = _input_bytes(right)
    if rb is not None and rb < broadcast_threshold:
        return broadcast_hash_join(left, right, key, join_type=join_type)
    return bucketed_hash_join(
        left, right, key, num_buckets=num_buckets, join_type=join_type
    )


def build_bloom(
    keys_ds: ray.data.Dataset,
    keys_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
):
    """Distributed Bloom build: one partial filter per batch (map-side),
    folded by bitwise OR. The driver holds only the fixed-size filters
    (num_bits/8 bytes each), never the keys."""
    from ..functions.sketches import BloomFilter

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
        bf.add_column(batch.column(keys_col))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    out = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        out.merge(BloomFilter.from_bytes(row["bloom"], num_hashes=num_hashes))
    return out


def _bucketed_membership_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    keys_col: str | None,
    num_buckets: int | None,
    anti: bool,
    bloom_bits: int = 0,
) -> ray.data.Dataset:
    """Shared core of the distributed semi/anti join: co-locate big-side
    rows with the filter keys by key-hash bucket, build the key set
    per-bucket (each bucket sees ~|keys|/B of the key side), filter there.
    The key side never touches the driver, so it may be fact-sized.

    ``bloom_bits > 0`` adds the classic shuffle-volume prefilter: a
    mergeable Bloom filter of the key side is built map-side (fixed-size
    partials, OR-fold) and broadcast; big-side rows the filter rules out
    are handled BEFORE the exchange — dropped (semi) or emitted directly
    (anti: a definite non-member is part of the answer) — and only the
    "maybe" rows pay the shuffle. False positives only add shuffle bytes;
    the per-bucket exact set decides membership either way."""
    if bloom_bits:
        bloom = build_bloom(keys_ds, keys_col or key_col, num_bits=bloom_bits)
        bloom_ref = ray.put(bloom.to_bytes())
        n_hashes = bloom.num_hashes

        def split(batch: pa.Table, keep_maybe: bool) -> pa.Table:
            from ..functions.sketches import BloomFilter

            bf = BloomFilter.from_bytes(ray.get(bloom_ref), num_hashes=n_hashes)
            maybe = bf.contains_column(batch.column(key_col))
            mask = maybe if keep_maybe else ~maybe
            return batch.filter(pa.array(mask))

        maybes = big.map_batches(
            split, batch_format="pyarrow", fn_kwargs={"keep_maybe": True}
        )
        joined = _bucketed_membership_join(
            maybes, keys_ds, key_col, keys_col, num_buckets, anti
        )
        if not anti:
            return joined
        definite_out = big.map_batches(
            split, batch_format="pyarrow", fn_kwargs={"keep_maybe": False}
        )
        return joined.union(definite_out)

    if num_buckets is None:
        num_buckets = _auto_num_buckets(big, keys_ds)
    keys_col = keys_col or key_col
    if big.schema() is None:  # schema-less ⇒ empty big side
        return big
    if keys_ds.schema() is None:  # schema-less ⇒ no filter keys
        return big if anti else big.limit(0)
    big_cols = list(big.schema().names)
    if "__is_key" in big_cols:
        raise ValueError("big side already has reserved column __is_key")

    def tag_big(batch: pa.Table) -> pa.Table:
        buckets = bucket_ids(batch.column(key_col), num_buckets)
        return batch.append_column(
            "__bucket", pa.array(buckets, pa.int32())
        ).append_column("__is_key", pa.array([False] * batch.num_rows, pa.bool_()))

    big_types = {
        n: t for n, t in zip(big.schema().names, big.schema().types)
    }

    def tag_keys(batch: pa.Table) -> pa.Table:
        # Local distinct first: duplicated filter keys add shuffle volume
        # but no information.
        keys = batch.select([keys_col]).group_by([keys_col]).aggregate([])
        vals = keys.column(keys_col)
        buckets = bucket_ids(vals, num_buckets)
        cols = {}
        for c in big_cols:
            if c == key_col:
                cols[c] = vals.cast(big_types[key_col])
            else:
                cols[c] = pa.nulls(len(vals), big_types[c])
        out = pa.table(cols)
        return out.append_column(
            "__bucket", pa.array(buckets, pa.int32())
        ).append_column("__is_key", pa.array([True] * len(vals), pa.bool_()))

    tagged = big.map_batches(tag_big, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_keys, batch_format="pyarrow")
    )

    def filter_bucket(group: pa.Table) -> pa.Table:
        is_key = group.column("__is_key")
        key_rows = group.filter(is_key)
        data_rows = group.filter(pc.invert(is_key))
        # skip_nulls: a null in the key SET must not make null probes
        # members (Arrow's default null-matching is MATCH — SQL semi/anti
        # say NULL keys never match).
        member = pc.fill_null(
            pc.is_in(
                data_rows.column(key_col),
                options=pc.SetLookupOptions(
                    value_set=key_rows.column(key_col).combine_chunks(),
                    skip_nulls=True,
                ),
            ),
            False,
        )
        mask = pc.invert(member) if anti else member
        return data_rows.filter(mask).select(big_cols)

    return tagged.groupby("__bucket").map_groups(
        filter_bucket, batch_format="pyarrow"
    )


def bucketed_semi_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    keys_col: str | None = None,
    num_buckets: int | None = None,
    bloom_bits: int = 0,
) -> ray.data.Dataset:
    """Keep big-side rows whose ``key_col`` appears in ``keys_ds.keys_col``
    — exact, fully distributed (no driver-side key set). ``bloom_bits``
    enables the Bloom shuffle prefilter (exactness preserved)."""
    return _bucketed_membership_join(
        big, keys_ds, key_col, keys_col, num_buckets, anti=False,
        bloom_bits=bloom_bits,
    )


def bucketed_anti_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    keys_col: str | None = None,
    num_buckets: int | None = None,
    bloom_bits: int = 0,
) -> ray.data.Dataset:
    """Keep big-side rows whose ``key_col`` does NOT appear in the key side
    — exact, fully distributed (no driver-side key set). ``bloom_bits``
    enables the Bloom prefilter: definite non-members skip the exchange
    entirely and are emitted map-side (exactness preserved)."""
    return _bucketed_membership_join(
        big, keys_ds, key_col, keys_col, num_buckets, anti=True,
        bloom_bits=bloom_bits,
    )


def interval_lookup_join(
    big: ray.data.Dataset,
    value_col: str,
    intervals: list[tuple],
    label_col: str = "band",
) -> ray.data.Dataset:
    """Range join against a small interval table: each row gets the label of
    the half-open ``[lo, hi)`` interval containing ``value_col``; rows
    outside every interval drop (inner semantics). ``intervals`` is a list
    of (label, lo, hi), non-overlapping. The band side is broadcast (it is
    a dim table by construction) and the probe is one vectorized
    ``np.searchsorted`` per batch — zero shuffle, the scale-correct plan
    for the banding/range-join shape."""
    import numpy as np

    ivs = sorted(intervals, key=lambda t: t[1])
    for (_, _, hi_a), (_, lo_b, _) in zip(ivs, ivs[1:]):
        if lo_b < hi_a:
            raise ValueError("intervals overlap")
    labels = [t[0] for t in ivs]
    los = np.asarray([t[1] for t in ivs], dtype=np.float64)
    his = np.asarray([t[2] for t in ivs], dtype=np.float64)
    state = ray.put((labels, los, his))

    def probe(batch: pa.Table) -> pa.Table:
        lab, lo, hi = ray.get(state)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo, vals, side="right") - 1
        valid = (idx >= 0) & (vals < hi[np.clip(idx, 0, len(hi) - 1)])
        kept = batch.filter(pa.array(valid))
        band = pa.array([lab[i] for i in idx[valid]], pa.string())
        return kept.append_column(label_col, band)

    return big.map_batches(probe, batch_format="pyarrow")


def semi_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    keys_col: str | None = None,
    num_buckets: int | None = None,
    broadcast_threshold: int = _BROADCAST_THRESHOLD_BYTES,
) -> ray.data.Dataset:
    """Semi join with automatic strategy: broadcast the key set when the key
    side's input files are small, else the exact bucketed path."""
    kb = _input_bytes(keys_ds)
    if kb is not None and kb < broadcast_threshold:
        keys = {
            r[keys_col or key_col]
            for r in keys_ds.select_columns([keys_col or key_col]).take_all()
        }
        return semi_join_filter(big, keys, key_col)
    return bucketed_semi_join(big, keys_ds, key_col, keys_col, num_buckets)


def anti_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key_col: str,
    keys_col: str | None = None,
    num_buckets: int | None = None,
    broadcast_threshold: int = _BROADCAST_THRESHOLD_BYTES,
) -> ray.data.Dataset:
    """Anti join with automatic strategy (see ``semi_join``)."""
    kb = _input_bytes(keys_ds)
    if kb is not None and kb < broadcast_threshold:
        keys = {
            r[keys_col or key_col]
            for r in keys_ds.select_columns([keys_col or key_col]).take_all()
        }
        return anti_join_filter(big, keys, key_col)
    return bucketed_anti_join(big, keys_ds, key_col, keys_col, num_buckets)


def _membership_filter(
    big: ray.data.Dataset, keys, key_col: str, anti: bool
) -> ray.data.Dataset:
    """Broadcast-set membership filter: the key set ships once as an Arrow
    array and every batch runs one vectorized ``pc.is_in`` (the Python
    ``v in set`` row loop this replaces cost ~100 ns × rows per batch).
    NULL keys are never members: semi drops them, anti keeps them —
    matching the bucketed variants."""
    key_ref = ray.put(pa.array(sorted(set(keys), key=repr)))

    def keep(batch: pa.Table) -> pa.Table:
        value_set = ray.get(key_ref)
        member = pc.is_in(
            batch.column(key_col),
            options=pc.SetLookupOptions(value_set=value_set, skip_nulls=True),
        )
        member = pc.fill_null(member, False)
        return batch.filter(pc.invert(member) if anti else member)

    return big.map_batches(keep, batch_format="pyarrow")


def semi_join_filter(
    big: ray.data.Dataset, keys, key_col: str
) -> ray.data.Dataset:
    """Keep big-side rows whose key is in ``keys`` (broadcast set). For
    dim-table-sized key sides only; fact-sized sides: bucketed_semi_join."""
    return _membership_filter(big, keys, key_col, anti=False)


def anti_join_filter(
    big: ray.data.Dataset, keys, key_col: str
) -> ray.data.Dataset:
    """Keep big-side rows whose key is NOT in ``keys`` (broadcast set). For
    dim-table-sized key sides only; fact-sized sides: bucketed_anti_join."""
    return _membership_filter(big, keys, key_col, anti=True)
