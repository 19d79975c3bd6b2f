"""Connected components over a near-duplicate pair set — cluster ids for
SemDeDup-style per-cluster sampling and duplicate-cluster analytics.

``dedup_minhash`` keeps min-id representatives pair-by-pair, which is
correct keep-one behavior for chains A~B~C, but yields no CLUSTER id. This
operator turns an (id_a, id_b) pair table into (node, component) rows,
``component`` = the smallest node id reachable through the pairs — min-label
propagation with edge contraction and pointer jumping (the alternating-star
family of MapReduce CC algorithms, Kiveris et al.), Ray-Data-first:

* every exchange is hash-partitioned (the repo's bucketed join /
  coarse-bucket reduce) — no per-key ``map_groups`` anywhere;
* per round, edges are RELABELED to their endpoints' current labels and the
  contracted edge set replaces the old one (self-loops drop, duplicates
  dedup) — near-clone pair sets (cliques) collapse to stars in ~2 rounds,
  so per-round exchange cost SHRINKS as components resolve (numpy-simulated
  convergence: 30-node-clique batches 2 rounds, 300-chain 9, 20k-chain 15,
  sparse random graphs 6-7 — all well under the 50-round default);
* each node also pointer-jumps (label(v) ← label(label(v))) every round, so
  nodes retired from the contracted edge set keep tracking their
  component's improving minimum;
* convergence detection is a single integer aggregate: labels only ever
  decrease, so an unchanged label sum IS the fixed point;
* between rounds, labels and edges round-trip through Parquet
  (``checkpoint_dir``, default a fresh /tmp dir) — an iterative Dataset
  loop must cut lineage each round or plan/object chains make every round
  slower than the last (measured 2.5 s → 36 s by round 3 on object-store
  materialize; the parquet cut holds round cost flat and is exactly what a
  resumable 100 TB run wants).

Node ids must be int64-compatible (doc ids).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import ray.data


def connected_components(
    edges: ray.data.Dataset,
    node_a: str = "id_a",
    node_b: str = "id_b",
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    small_threshold: int = 200_000,
    resume_token: str | None = None,
) -> ray.data.Dataset:
    """(node, component) for every node that appears in ``edges``;
    ``component`` = min node id of the connected component. Nodes with no
    pairs are singleton clusters — callers that want them emit
    (doc_id, doc_id) for ids absent from this output (a left join).
    Raises if ``max_rounds`` does not reach the fixed point.

    Checkpoint semantics (round-4 advice hardened both):
    * ``checkpoint_dir`` + ``resume_token``: completed stages are skipped
      via ``_complete`` markers, and the marker now RECORDS the caller's
      ``resume_token`` — reusing a dir whose markers carry a different
      token invalidates those stages instead of silently replaying the
      previous input's clustering. Callers that reuse dirs across inputs
      should derive the token from the edge set's identity (source path +
      version); None keeps markers tokenless (fresh-dir usage).
    * /tmp hygiene: a default (mkdtemp) dir is registered for removal at
      process exit — after the returned lazy dataset has been consumable
      for the whole session — and the adaptive small path (whose result
      is already driver-memory) removes it immediately; repeated runs no
      longer accumulate unbounded /tmp parquet. On a clean distributed
      finish the intermediate round files are deleted either way.

    Adaptive like the repo's joins: after the distributed canonical-dedup
    pass, a pair set of ≤ ``small_threshold`` DISTINCT edges (a few MB —
    checked, never assumed) collapses on the driver with union-find in one
    pass; larger pair sets run the iterative distributed loop below. The
    same small-side-vs-bucketed routing rule as ``stages/joins.hash_join``
    — each loop round costs several fixed-overhead Ray jobs, which the
    driver path amortizes away exactly when the data is driver-sized.

    Skew (documented single-reducer assumption, round-4 advice): message
    reduce and relabel joins key by NODE (uniform), but a giant component
    concentrates rows on its minimum label — its star's edges in the
    relabel join and its nodes' pointer rows in the pointer-jump join land
    in that label's bucket, O(|component|) tiny int64 rows (~24 B each) in
    one reducer for the round. The map-side min-combiner below keeps the
    MESSAGE volume at ≤ blocks × distinct-nodes-per-block, so the binding
    case is a duplicate cluster of ~10⁹ members (~24 GB in one task). If
    that ever binds: salt the pointer-jump left side and replicate the
    (unique-per-ptr) right side per salt — the join stays exact."""
    import pyarrow.compute as pc

    from .joins import _auto_num_buckets, bucketed_hash_join
    from .shuffle import coarse_bucketed_groupby

    if edges.schema() is None:
        return ray.data.from_arrow(_empty_labels())
    owned_dir = checkpoint_dir is None
    if owned_dir:
        checkpoint_dir = tempfile.mkdtemp(prefix="pdtr_cc_")
        import atexit
        import shutil as _shutil

        atexit.register(_shutil.rmtree, checkpoint_dir, ignore_errors=True)
    nb = _auto_num_buckets(edges)

    def canonical(batch: pa.Table) -> pa.Table:
        a = batch.column(node_a).cast(pa.int64())
        b = batch.column(node_b).cast(pa.int64())
        return pa.table(
            {"u": pc.min_element_wise(a, b), "v": pc.max_element_wise(a, b)}
        ).filter(pc.not_equal(a, b))

    e = _ckpt(
        coarse_bucketed_groupby(
            edges.map_batches(canonical, batch_format="pyarrow"),
            ["u", "v"],
            [],
            num_buckets=nb,
        ),
        checkpoint_dir,
        "edges_0",
        nb,
        token=resume_token,
    )

    # take(threshold+1) bounds driver memory whether or not the set is
    # small; only a genuinely small set is ever fully collected.
    probe = e.take(small_threshold + 1)
    if len(probe) <= small_threshold:
        out = ray.data.from_arrow(_union_find_table(probe))
        if owned_dir:
            # The result is driver-memory; the owned tmp dir has no
            # further reader — remove it now, not just at process exit.
            import shutil

            shutil.rmtree(checkpoint_dir, ignore_errors=True)
        return out

    def as_labels(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": batch.column("u")}),
                pa.table({"node": batch.column("v")}),
            ]
        )

    labels = _ckpt(
        coarse_bucketed_groupby(
            e.map_batches(as_labels, batch_format="pyarrow"),
            ["node"],
            [],
            num_buckets=nb,
        ).map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "label": t.column("node")}
            ),
            batch_format="pyarrow",
        ),
        checkpoint_dir,
        "labels_0",
        nb,
        token=resume_token,
    )

    prev_sum = None
    for r in range(1, max_rounds + 1):
        # relabel both endpoints with current labels (two bucketed joins)
        lu = bucketed_hash_join(
            e.map_batches(
                lambda t: t.rename_columns(["node", "v"]), batch_format="pyarrow"
            ),
            labels,
            "node",
            num_buckets=nb,
        ).map_batches(
            lambda t: pa.table(
                {"u": t.column("node"), "v": t.column("v"), "lu": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        both = bucketed_hash_join(
            lu.map_batches(
                lambda t: t.rename_columns(["u", "node", "lu"]),
                batch_format="pyarrow",
            ),
            labels.map_batches(
                lambda t: t.rename_columns(["node", "lv"]), batch_format="pyarrow"
            ),
            "node",
            num_buckets=nb,
        ).map_batches(
            lambda t: pa.table(
                {
                    "u": t.column("u"),
                    "v": t.column("node"),
                    "lu": t.column("lu"),
                    "lv": t.column("lv"),
                }
            ),
            batch_format="pyarrow",
        )
        both = _ckpt(
            both, checkpoint_dir, f"relabel_{r}", nb,
            pa.schema([(c, pa.int64()) for c in ("u", "v", "lu", "lv")]),
            token=resume_token,
        )

        # messages: the per-edge minimum reaches both endpoints AND both
        # endpoint labels; merged = min(labels, messages). The map-side
        # min-combiner (one Arrow group_by per batch) bounds a hot label's
        # bucket at ≤ blocks rows instead of O(its component's edges) —
        # the skew note in the operator docstring.
        def msgs_batch(t: pa.Table) -> pa.Table:
            m = pc.min_element_wise(t.column("lu"), t.column("lv"))
            parts = [
                pa.table({"node": t.column(c), "label": m})
                for c in ("u", "v", "lu", "lv")
            ]
            combined = (
                pa.concat_tables(parts)
                .group_by("node")
                .aggregate([("label", "min")])
            )
            return combined.rename_columns(["node", "label"])

        merged = (
            coarse_bucketed_groupby(
                labels.union(
                    both.map_batches(msgs_batch, batch_format="pyarrow")
                ),
                ["node"],
                [("label", "min")],
                num_buckets=nb,
            ).map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
        )
        merged = _ckpt(
            merged, checkpoint_dir, f"merged_{r}", nb, token=resume_token
        )

        # pointer jump: label(v) ← label(label(v)). merged is unique per
        # node and every label IS a node, so the inner self-join emits
        # exactly one row per node — no further reduce needed.
        labels = bucketed_hash_join(
            merged.map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "ptr": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            merged.map_batches(
                lambda t: pa.table(
                    {"ptr": t.column("node"), "label": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            "ptr",
            num_buckets=nb,
        ).map_batches(
            lambda t: t.select(["node", "label"]), batch_format="pyarrow"
        )
        labels = _ckpt(
            labels, checkpoint_dir, f"labels_{r}", nb, token=resume_token
        )

        # contract: next round's edges are the relabeled endpoints
        # (self-loops drop, duplicates dedup) — the edge set shrinks as
        # components resolve
        def contract(t: pa.Table) -> pa.Table:
            lu_, lv_ = t.column("lu"), t.column("lv")
            out = pa.table(
                {
                    "u": pc.min_element_wise(lu_, lv_),
                    "v": pc.max_element_wise(lu_, lv_),
                }
            )
            return out.filter(pc.not_equal(lu_, lv_))

        # Lazy on purpose (no checkpoint): the contracted edge set is
        # consumed exactly once (next round's relabel join) and its
        # lineage roots at the checkpointed relabel table, so plan depth
        # stays one round regardless.
        e = coarse_bucketed_groupby(
            both.map_batches(contract, batch_format="pyarrow"),
            ["u", "v"],
            [],
            num_buckets=nb,
        )

        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Clean finish: drop every intermediate round's files so repeated runs
    # don't accumulate /tmp parquet; the final labels stay readable for the
    # returned (lazy) dataset. A crashed run keeps everything for resume.
    import shutil

    keep = f"labels_{r}"
    for name in os.listdir(checkpoint_dir):
        if name != keep:
            shutil.rmtree(os.path.join(checkpoint_dir, name), ignore_errors=True)
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow",
    )


def _union_find_table(rows: list[dict]) -> pa.Table:
    """Driver-side union-find over a small canonical (u, v) edge list —
    the adaptive small path of ``connected_components``."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(int(r["u"])), find(int(r["v"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def _empty_labels() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
    )


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _ckpt(
    ds: ray.data.Dataset,
    checkpoint_dir: str,
    name: str,
    nb: int,
    empty_schema: pa.Schema | None = None,
    token: str | None = None,
) -> ray.data.Dataset:
    """Parquet round-trip: cuts plan lineage AND object-store references so
    every round starts from a flat on-disk read (resumable, spillable —
    the curate.py phase pattern applied per iteration). A dataset that
    shrank to zero rows (the contracted edge set at convergence) comes back
    as an empty typed table instead of a file-less read.

    ``token`` (the caller's resume_token) is written INTO the marker; a
    pre-existing marker with different contents means the dir holds a
    DIFFERENT input's checkpoints — the stage recomputes instead of
    silently replaying it (round-4 advice)."""
    path = os.path.join(checkpoint_dir, name)
    marker = os.path.join(path, "_complete")
    expected = token or ""
    done = False
    if os.path.exists(marker):
        with open(marker) as f:
            done = f.read() == expected
    if not done:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        ds.repartition(nb).write_parquet(path)
        # an all-empty dataset may write no files (and no directory)
        os.makedirs(path, exist_ok=True)
        with open(marker, "w") as f:
            f.write(expected)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        return ray.data.from_arrow((empty_schema or _EDGE_SCHEMA).empty_table())
    return ray.data.read_parquet(path, file_extensions=["parquet"])
