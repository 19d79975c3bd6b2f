"""Connected components (min-label propagation + pointer jumping) vs a
pure-Python union-find oracle."""

from __future__ import annotations

import random

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(edges, **kw):
    from pii_detection_test_ray.stages.graph import connected_components

    ds = ray.data.from_items(
        [{"id_a": a, "id_b": b} for a, b in edges], override_num_blocks=4
    )
    return {
        r["node"]: r["component"]
        for r in connected_components(ds, **kw).take_all()
    }


def test_components_random_graph_distributed_matches_union_find(ray_session):
    """small_threshold=0 forces the iterative distributed loop (the 100-TB
    path) — contraction + jump + sum-convergence all exercised."""
    rng = random.Random(7)
    edges = [
        e
        for e in (
            (rng.randint(0, 199), rng.randint(0, 199)) for _ in range(150)
        )
        if e[0] != e[1]  # self-pairs are not pairs (operator contract)
    ]
    assert _run(edges, small_threshold=0) == _union_find(edges)


def test_components_long_chain_converges_fast(ray_session):
    """A 300-node chain needs ~300 rounds under plain propagation; the
    distributed loop's contraction + pointer jumping must close it within
    the 50-round default (it takes ~log2)."""
    edges = [(i, i + 1) for i in range(299)]
    got = _run(edges, small_threshold=0)
    assert got == {i: 0 for i in range(300)}


def test_components_small_path_matches_union_find(ray_session):
    """The adaptive driver-side union-find (pair sets under the checked
    threshold) must agree with the oracle — and with the distributed loop
    (same random graph as the distributed test above)."""
    rng = random.Random(7)
    edges = [
        e
        for e in (
            (rng.randint(0, 199), rng.randint(0, 199)) for _ in range(150)
        )
        if e[0] != e[1]
    ]
    assert _run(edges) == _union_find(edges)


def test_components_isolated_pairs_and_triangle(ray_session):
    edges = [(5, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    assert _run(edges) == _union_find(edges)


def test_components_empty_edges(ray_session):
    from pii_detection_test_ray.stages.graph import connected_components

    ds = ray.data.from_items([{"id_a": 1, "id_b": 2}]).filter(
        lambda r: False
    )
    assert connected_components(ds).take_all() == []


def test_checkpoint_token_invalidates_stale_dir(ray_session, tmp_path):
    """Round-4 advice: reusing a checkpoint dir with DIFFERENT edges must
    not silently replay the previous run's clustering when the caller
    supplies a resume token; and the default (owned tmp dir) small path
    cleans up after itself."""
    import os

    import ray.data

    from pii_detection_test_ray.stages.graph import connected_components

    d = str(tmp_path / "cc")
    e1 = ray.data.from_items(
        [{"id_a": 1, "id_b": 2}], override_num_blocks=1
    )
    out1 = {
        (r["node"], r["component"])
        for r in connected_components(
            e1, checkpoint_dir=d, resume_token="v1", small_threshold=0
        ).take_all()
    }
    assert out1 == {(1, 1), (2, 1)}
    # Same dir, different edges + different token: stages recompute.
    e2 = ray.data.from_items(
        [{"id_a": 5, "id_b": 9}], override_num_blocks=1
    )
    out2 = {
        (r["node"], r["component"])
        for r in connected_components(
            e2, checkpoint_dir=d, resume_token="v2", small_threshold=0
        ).take_all()
    }
    assert out2 == {(5, 5), (9, 5)}

    # Owned-dir small path: no pdtr_cc_ dir survives the call.
    import glob

    before = set(glob.glob("/tmp/pdtr_cc_*"))
    connected_components(e1, small_threshold=10).take_all()
    after = set(glob.glob("/tmp/pdtr_cc_*"))
    assert after - before == set()
