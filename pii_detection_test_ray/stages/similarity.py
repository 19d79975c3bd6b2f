"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_brute_force`` — the exact baseline: the (small) query matrix is
  broadcast once via ``ray.put``; each Arrow batch computes a numpy matmul
  against it and emits its local top-k; a ``groupby(query_id)`` reduces
  local candidates to the global top-k. The heavy side (the corpus) is
  never shuffled — only ≤ k·num_blocks candidate rows move.
* ``knn_ivf`` — the scale path: seeded k-means centroids (built from a
  bounded sample), corpus rows assigned to their nearest centroid inside
  ``map_batches``, queries probe only the ``nprobe`` nearest centroids, so
  the scored fraction is ~nprobe/n_clusters of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _drop_null_vecs(batch: pa.Table, vec_col: str) -> pa.Table:
    """Rows without an embedding cannot be scored, assigned or matched —
    every embedding operator filters them up front (the SQL analog is
    WHERE embedding IS NOT NULL; a NULL vector has no cosine)."""
    import pyarrow.compute as pc

    return batch.filter(pc.is_valid(batch.column(vec_col)))


def _as_matrix(col) -> np.ndarray:
    """List<float> column → (n, dim) float64 matrix via the flat values
    buffer (vectorized; no per-row Python lists). Falls back to to_pylist
    only for ragged rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        # Empty blocks reach UDFs after upstream filters; a (0, 0) matrix
        # keeps axis-1 kernels (norms, matmuls) well-defined downstream.
        return np.zeros((0, 0), dtype=np.float64)
    try:
        import pyarrow.compute as pc

        lengths = pc.list_value_length(col).to_numpy()
        if len(lengths) and (lengths == lengths[0]).all() and col.null_count == 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(
                len(col), int(lengths[0])
            )
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _global_topk(
    candidates: ray.data.Dataset, id_col: str, k: int
) -> ray.data.Dataset:
    """Shared final reducer: per query_id, keep the k best (score desc,
    id asc) rows from all blocks' local top-k lists — routed through the
    repo-standard coarse-bucket top-k (``top_k_per_group``: one task per
    query-id hash bucket, one lexsort, no per-query Python), so large query
    sets never hit a per-key ``map_groups``."""
    from .windows import top_k_per_group

    out = top_k_per_group(candidates, "query_id", "score", id_col, k=k)
    return out.map_batches(
        lambda t: t.select(["query_id", id_col, "score"]),
        batch_format="pyarrow",
    )


def knn_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k: rows (query_id, vec_id, score), k rows per query,
    scores descending, ties broken by ascending vec_id (deterministic)."""
    q_unit = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q_unit)

    def local_topk(batch: pa.Table) -> pa.Table:
        batch = _drop_null_vecs(batch, vec_col)
        if batch.num_rows == 0:  # empty blocks reach UDFs after filters
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: batch.column(id_col),
                    "score": pa.array([], pa.float64()),
                }
            )
        q = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        sims = q @ vecs.T  # (n_queries, batch)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # partial top-k then deterministic (−score, id) ordering
            cand = np.argpartition(-row, kk - 1)[:kk]
            cand = sorted(cand, key=lambda c: (-row[c], ids[c]))
            for c in cand:
                out_q.append(qi)
                out_id.append(ids[c])
                out_s.append(float(row[c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return _global_topk(
        ds.map_batches(local_topk, batch_format="pyarrow"), id_col, k
    )


def kmeans_centroids(
    sample: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a bounded in-memory sample."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def embedding_clusters(
    ds: ray.data.Dataset,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 42,
) -> ray.data.Dataset:
    """SemDeDup-style semantic partitioning: k-means centroids trained on a
    bounded sample (broadcast once via ``ray.put``), then every vector is
    assigned to its nearest centroid in ONE vectorized map pass (argmax of
    a matmul per batch — no shuffle). Output per row: (id, cluster,
    centroid_sim). Downstream semantic dedup keeps one representative per
    tight cluster, and the cluster id doubles as a co-location key for
    per-cluster work."""
    sample_rows = ds.limit(sample_size).select_columns([vec_col]).take_all()
    sample = np.asarray(
        [r[vec_col] for r in sample_rows if r[vec_col] is not None],
        dtype=np.float64,
    )
    centroids = kmeans_centroids(sample, n_clusters, seed=seed)
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        batch = _drop_null_vecs(batch, vec_col)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "cluster": pa.array([], pa.int64()),
                    "centroid_sim": pa.array([], pa.float64()),
                }
            )
        cents = ray.get(ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        sims = vecs @ cents.T
        best = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(best, pa.int64()),
                "centroid_sim": pa.array(
                    sims[np.arange(len(best)), best], pa.float64()
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 42,
) -> ray.data.Dataset:
    """IVF-style ANN: score only rows whose coarse cluster is among each
    query's ``nprobe`` closest centroids. Same output shape as brute force;
    approximate recall (tested ≥ the IVF guarantee on synthetic clusters)."""
    sample_rows = ds.limit(sample_size).select_columns([vec_col]).take_all()
    sample = np.asarray(
        [r[vec_col] for r in sample_rows if r[vec_col] is not None],
        dtype=np.float64,
    )
    centroids = kmeans_centroids(sample, n_clusters, seed=seed)

    q_unit = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    state = ray.put((q_unit, centroids, probed))

    def local_topk(batch: pa.Table) -> pa.Table:
        batch = _drop_null_vecs(batch, vec_col)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: batch.column(id_col),
                    "score": pa.array([], pa.float64()),
                }
            )
        q, cents, probe = ray.get(state)
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        assign = np.argmax(vecs @ cents.T, axis=1)  # coarse cluster per row
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, probe[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = q[qi] @ vecs[mask].T
            kk = min(k, len(sub_ids))
            cand = np.argpartition(-sims, kk - 1)[:kk]
            cand = sorted(cand, key=lambda c: (-sims[c], sub_ids[c]))
            for c in cand:
                out_q.append(qi)
                out_id.append(sub_ids[c])
                out_s.append(float(sims[c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    return _global_topk(
        ds.map_batches(local_topk, batch_format="pyarrow"), id_col, k
    )
