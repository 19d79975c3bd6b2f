"""Sequence packing: greedy concatenation of documents into fixed
token-budget training sequences — the last data-prep step before
tokenized LLM training (T5 / GPT-3 style packing), which none of the
reference stack covers (SURVEY §2 extension; sibling of the token-budget
queries).

Packing is inherently order-dependent, so a distributed version must pin
an order or results change with partitioning. Here: documents hash into
buckets (``_bucket_of`` on the id — the same bucket hash as the joins), a
single ``groupby`` co-locates each bucket, and inside the bucket task the
docs are sorted by id and packed greedily first-fit-in-order. Result:
bit-identical output under ANY input partitioning, one shuffle total, and
bucket tasks sized by the usual ~128 MiB rule. A document longer than the
budget becomes its own (oversize) sequence — flagged, never silently
truncated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    token_counts_col: str,
    max_tokens: int,
    num_buckets: int | None = None,
    bucket_col: str | None = None,
) -> ray.data.Dataset:
    """Pack rows (pre-counted: ``token_counts_col``) into sequences of at
    most ``max_tokens`` tokens. Output one row per packed sequence:
    (bucket, seq_idx, n_docs, n_tokens, oversize, doc_ids).

    ``bucket_col`` names a caller-supplied int32 co-location column in
    place of the default id hash — e.g. ``doc_id % k``, whose arithmetic a
    SQL oracle can mirror exactly (the hash cannot be expressed in SQL)."""
    from ..functions.hashing import bucket_ids
    from .joins import _auto_num_buckets

    if num_buckets is None:
        num_buckets = _auto_num_buckets(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if bucket_col is not None:
            return batch.append_column(
                "__bucket", batch.column(bucket_col).cast(pa.int32())
            ).drop_columns([bucket_col])
        buckets = bucket_ids(batch.column(id_col), num_buckets)
        return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

    def pack_bucket(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        toks = group.column(token_counts_col).to_pylist()
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        bucket = group.column("__bucket")[0].as_py() if group.num_rows else 0
        seqs: list[dict] = []
        cur_ids: list = []
        cur_tokens = 0

        def flush() -> None:
            if cur_ids:
                seqs.append(
                    {
                        "n_docs": len(cur_ids),
                        "n_tokens": cur_tokens,
                        "doc_ids": list(cur_ids),
                        "oversize": False,
                    }
                )

        for i in order:
            t = toks[i]
            if t > max_tokens:  # strictly longer: exact-fit docs pack normally
                # oversize doc: its own sequence, current pack unaffected
                seqs.append(
                    {
                        "n_docs": 1,
                        "n_tokens": t,
                        "doc_ids": [ids[i]],
                        "oversize": True,
                    }
                )
                continue
            if cur_tokens + t > max_tokens:
                flush()
                cur_ids, cur_tokens = [], 0
            cur_ids.append(ids[i])
            cur_tokens += t
        flush()
        id_type = group.schema.field(id_col).type
        return pa.table(
            {
                "bucket": pa.array([bucket] * len(seqs), pa.int32()),
                "seq_idx": pa.array(range(len(seqs)), pa.int64()),
                "n_docs": pa.array([s["n_docs"] for s in seqs], pa.int64()),
                "n_tokens": pa.array([s["n_tokens"] for s in seqs], pa.int64()),
                "oversize": pa.array(
                    [s["oversize"] for s in seqs], pa.bool_()
                ),
                "doc_ids": pa.array(
                    [s["doc_ids"] for s in seqs], pa.list_(id_type)
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pack_bucket, batch_format="pyarrow")
    )
