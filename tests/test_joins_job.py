"""Bucketed hash join, semi/anti joins, and the ray-job entrypoint."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bucketed_hash_join_matches_pandas(ray_session):
    import pandas as pd

    from pii_detection_test_ray.stages.joins import bucketed_hash_join

    left_rows = [{"k": i % 7, "lv": i} for i in range(50)]
    right_rows = [{"k": k, "rv": f"r{k}"} for k in range(5)]  # keys 5,6 unmatched
    out = bucketed_hash_join(
        ray.data.from_items(left_rows, override_num_blocks=2),
        ray.data.from_items(right_rows, override_num_blocks=1),
        key="k",
        num_buckets=4,
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    expected = sorted(
        (l["k"], l["lv"], f"r{l['k']}") for l in left_rows if l["k"] < 5
    )
    assert got == expected


def test_bucketed_left_outer_join(ray_session):
    from pii_detection_test_ray.stages.joins import bucketed_hash_join

    left_rows = [{"k": i, "lv": i * 10} for i in range(8)]
    right_rows = [{"k": k, "rv": f"r{k}"} for k in (1, 3, 5)]
    out = bucketed_hash_join(
        ray.data.from_items(left_rows, override_num_blocks=2),
        ray.data.from_items(right_rows, override_num_blocks=1),
        key="k",
        num_buckets=4,
        join_type="left outer",
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    expected = sorted(
        (l["k"], l["lv"], f"r{l['k']}" if l["k"] in (1, 3, 5) else None)
        for l in left_rows
    )
    assert got == expected  # every left row survives; unmatched carry nulls


def test_broadcast_left_outer_matches_bucketed(ray_session):
    from pii_detection_test_ray.stages.joins import (
        broadcast_hash_join,
        bucketed_hash_join,
    )

    left_rows = [{"k": i % 6, "lv": i} for i in range(30)]
    right_rows = [{"k": k, "rv": f"r{k}"} for k in (0, 2, 4)]
    l = ray.data.from_items(left_rows, override_num_blocks=2)
    r = ray.data.from_items(right_rows, override_num_blocks=1)
    a = sorted(
        (x["k"], x["lv"], x["rv"])
        for x in broadcast_hash_join(l, r, "k", join_type="left outer").take_all()
    )
    b = sorted(
        (x["k"], x["lv"], x["rv"])
        for x in bucketed_hash_join(
            l, r, "k", num_buckets=4, join_type="left outer"
        ).take_all()
    )
    assert a == b and len(a) == 30  # outer: every left row present


def test_bucketed_hash_join_rejects_collision(ray_session):
    from pii_detection_test_ray.stages.joins import bucketed_hash_join

    a = ray.data.from_items([{"k": 1, "x": 1}], override_num_blocks=1)
    b = ray.data.from_items([{"k": 1, "x": 2}], override_num_blocks=1)
    with pytest.raises(ValueError):
        bucketed_hash_join(a, b, key="k")


def test_semi_anti_join_partition(ray_session):
    from pii_detection_test_ray.stages.joins import anti_join_filter, semi_join_filter

    rows = [{"id": i, "key": i % 10} for i in range(100)]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    keys = {2, 4, 6}
    semi = semi_join_filter(ds, keys, "key").take_all()
    anti = anti_join_filter(ds, keys, "key").take_all()
    assert len(semi) == 30 and all(r["key"] in keys for r in semi)
    assert len(anti) == 70 and all(r["key"] not in keys for r in anti)
    assert len(semi) + len(anti) == len(rows)


def test_job_entrypoint_runs_and_resumes(tmp_path):
    """jobs/run_pipeline.py end-to-end in a fresh process (its own Ray),
    including the resume path (second run skips everything)."""
    from pii_detection_test_ray.sources.corpus import CorpusConfig, write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, CorpusConfig(n_docs=80), shards=4)
    out = str(tmp_path / "out")
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--input", f"{corpus}/documents", "--output", out,
        "--group-size", "2", "--batch-size", "64",
        "--actors-per-model-stage", "1",
    ]
    env = dict(os.environ, RAY_ADDRESS="local")
    first = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert first.returncode == 0, first.stderr[-2000:]
    s1 = json.loads(first.stdout.strip().splitlines()[-1])
    assert s1["rows_in"] == 80 and s1["rows_out"] == 80 and s1["skipped"] == 0

    second = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert second.returncode == 0, second.stderr[-2000:]
    s2 = json.loads(second.stdout.strip().splitlines()[-1])
    assert s2["skipped"] == s2["groups"] == s1["groups"]


def test_job_entrypoint_stages_json(tmp_path):
    """--stages-json assembles the pipeline from the registry in the job
    CLI: a config-driven extract -> gate -> scrub run over raw pages."""
    from pii_detection_test_ray.sources.corpus import CorpusConfig, write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, CorpusConfig(n_docs=40), shards=2)
    out = str(tmp_path / "out")
    cfg = tmp_path / "stages.json"
    cfg.write_text(json.dumps([
        {"stage": "extract"},
        {"stage": "drop_html"},
        {"stage": "models", "concurrency": [1, 1]},
        {"stage": "quality_features"},
        {"stage": "gate", "quality": {"min_chars": 10}},
        {"stage": "pii_scrub"},
    ]))
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--input", f"{corpus}/documents", "--output", out,
        "--group-size", "2", "--batch-size", "64",
        "--stages-json", str(cfg),
    ]
    env = dict(os.environ, RAY_ADDRESS="local")
    run = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert run.returncode == 0, run.stderr[-2000:]
    s = json.loads(run.stdout.strip().splitlines()[-1])
    assert s["rows_in"] == 40 and s["rows_out"] == 40 and "kept" in s

    import glob

    import pyarrow.parquet as pq
    part = sorted(glob.glob(out + "/part-*"))[0]
    t = pq.read_table(part)
    assert {"keep", "scrubbed_text", "n_pii_spans"} <= set(t.column_names)


def test_bucketed_semi_anti_join_match_broadcast(ray_session):
    """Distributed (bucketed) semi/anti joins produce exactly the broadcast
    variants' row sets — with the key side kept as a Dataset throughout."""
    from pii_detection_test_ray.stages.joins import (
        anti_join_filter,
        bucketed_anti_join,
        bucketed_semi_join,
        semi_join_filter,
    )

    rows = [{"id": i, "key": i % 10} for i in range(100)]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    # key side with duplicates + a different column name
    key_rows = [{"fk": k} for k in (2, 4, 6, 4, 2)]
    keys_ds = ray.data.from_items(key_rows, override_num_blocks=2)

    semi = bucketed_semi_join(ds, keys_ds, "key", keys_col="fk", num_buckets=4)
    anti = bucketed_anti_join(ds, keys_ds, "key", keys_col="fk", num_buckets=4)
    semi_ids = sorted(r["id"] for r in semi.take_all())
    anti_ids = sorted(r["id"] for r in anti.take_all())

    expect_semi = sorted(
        r["id"] for r in semi_join_filter(ds, {2, 4, 6}, "key").take_all()
    )
    expect_anti = sorted(
        r["id"] for r in anti_join_filter(ds, {2, 4, 6}, "key").take_all()
    )
    assert semi_ids == expect_semi and anti_ids == expect_anti
    assert len(semi_ids) + len(anti_ids) == len(rows)


def test_bucketed_anti_join_empty_key_side(ray_session):
    from pii_detection_test_ray.stages.joins import bucketed_anti_join

    ds = ray.data.from_items(
        [{"id": i, "key": i} for i in range(10)], override_num_blocks=2
    )
    empty = ds.filter(lambda r: False).select_columns(["key"])
    out = bucketed_anti_join(ds, empty, "key", num_buckets=2).take_all()
    assert sorted(r["id"] for r in out) == list(range(10))


def test_broadcast_hash_join_schemaless_left(ray_session):
    """A fully-filtered (schema-less) probe side degrades to empty output —
    same contract as the bucketed path, so the adaptive router's behavior
    does not depend on which strategy it picks."""
    from pii_detection_test_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_items([{"k": 1, "lv": 2}]).filter(lambda r: False)
    right = ray.data.from_items([{"k": 1, "rv": 3}])
    assert broadcast_hash_join(left, right, key="k").take_all() == []


def test_broadcast_hash_join_duplicate_keys(ray_session):
    """Broadcast inner join fans out on duplicate build-side keys and
    preserves declared dtypes."""
    from pii_detection_test_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_items(
        [{"k": i % 3, "lv": i} for i in range(9)], override_num_blocks=2
    )
    right = ray.data.from_items(
        [{"k": 0, "rv": 10}, {"k": 0, "rv": 20}, {"k": 1, "rv": 30}],
        override_num_blocks=1,
    )
    out = broadcast_hash_join(left, right, key="k").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    expected = sorted(
        (l % 3, l, rv)
        for l in range(9)
        for rv in {0: [10, 20], 1: [30], 2: []}[l % 3]
    )
    assert got == expected


def test_hash_join_router_strategies_agree(ray_session, tmp_path):
    """hash_join picks broadcast for tiny file-backed build sides; both
    strategies return identical row sets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pii_detection_test_ray.stages.joins import bucketed_hash_join, hash_join

    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(
        pa.table({"k": [i % 5 for i in range(40)], "lv": list(range(40))}), lp
    )
    pq.write_table(pa.table({"k": [0, 1, 2], "rv": ["a", "b", "c"]}), rp)
    left = ray.data.read_parquet(lp, override_num_blocks=2)
    right = ray.data.read_parquet(rp, override_num_blocks=1)

    via_router = sorted(
        (r["k"], r["lv"], r["rv"]) for r in hash_join(left, right, "k").take_all()
    )
    via_bucketed = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in bucketed_hash_join(left, right, "k", num_buckets=4).take_all()
    )
    assert via_router == via_bucketed and len(via_router) == 24


def test_interval_lookup_join(ray_session):
    from pii_detection_test_ray.stages.joins import interval_lookup_join

    rows = [{"v": float(v)} for v in (0.5, 5, 10, 25, 99.9, 100, 250, -3)]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    bands = [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1000.0)]
    out = sorted(
        (r["v"], r["band"])
        for r in interval_lookup_join(ds, "v", bands).take_all()
    )
    # -3 is outside every interval and drops; boundaries are [lo, hi)
    assert out == [
        (0.5, "low"), (5.0, "low"), (10.0, "mid"), (25.0, "mid"),
        (99.9, "mid"), (100.0, "high"), (250.0, "high"),
    ]
    with pytest.raises(ValueError):
        interval_lookup_join(ds, "v", [("a", 0.0, 10.0), ("b", 5.0, 20.0)])


def test_bloom_prefiltered_semi_anti_match_exact(ray_session):
    """Bloom prefilter preserves exact semi/anti semantics, including under
    a deliberately tiny (collision-heavy) filter — false positives may
    only add shuffle volume, never rows."""
    from pii_detection_test_ray.stages.joins import (
        bucketed_anti_join,
        bucketed_semi_join,
    )

    rows = [{"id": i, "key": i % 50} for i in range(400)]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    keys_ds = ray.data.from_items(
        [{"fk": k} for k in range(0, 50, 3)], override_num_blocks=2
    )
    base_semi = sorted(
        r["id"]
        for r in bucketed_semi_join(ds, keys_ds, "key", keys_col="fk").take_all()
    )
    base_anti = sorted(
        r["id"]
        for r in bucketed_anti_join(ds, keys_ds, "key", keys_col="fk").take_all()
    )
    for bits in (1 << 16, 64):  # roomy and collision-saturated
        semi = sorted(
            r["id"]
            for r in bucketed_semi_join(
                ds, keys_ds, "key", keys_col="fk", bloom_bits=bits
            ).take_all()
        )
        anti = sorted(
            r["id"]
            for r in bucketed_anti_join(
                ds, keys_ds, "key", keys_col="fk", bloom_bits=bits
            ).take_all()
        )
        assert semi == base_semi and anti == base_anti


def test_bloom_filter_no_false_negatives(ray_session):
    """Membership 'no' is exact by construction; fuzz across dtypes."""
    import numpy as np
    import pyarrow as pa

    from pii_detection_test_ray.functions.sketches import BloomFilter

    for vals, probes in [
        (list(range(0, 1000, 7)), list(range(1000))),
        ([f"k{i}" for i in range(500)], [f"k{i}" for i in range(700)]),
    ]:
        bf = BloomFilter(num_bits=1 << 14)
        bf.add_column(pa.array(vals))
        mask = bf.contains_column(pa.array(probes))
        member = np.array([p in set(vals) for p in probes])
        assert mask[member].all()  # no false negatives


def test_membership_joins_null_key_semantics(ray_session):
    """SQL semi/anti: a NULL key is never a member — even when the key
    side itself contains NULLs (Arrow's is_in default would call that a
    match; round-3 review)."""
    from pii_detection_test_ray.stages.joins import (
        anti_join_filter,
        bucketed_anti_join,
        bucketed_semi_join,
        semi_join_filter,
    )

    rows = [{"id": 0, "key": 1}, {"id": 1, "key": None}, {"id": 2, "key": 3}]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    keys_ds = ray.data.from_items(
        [{"fk": 1}, {"fk": None}], override_num_blocks=1
    )
    semi = sorted(r["id"] for r in bucketed_semi_join(ds, keys_ds, "key", keys_col="fk", num_buckets=2).take_all())
    anti = sorted(r["id"] for r in bucketed_anti_join(ds, keys_ds, "key", keys_col="fk", num_buckets=2).take_all())
    assert semi == [0]          # null-key row is NOT a member
    assert anti == [1, 2]       # ...and survives the anti join
    # broadcast variants agree
    assert sorted(r["id"] for r in semi_join_filter(ds, {1, None}, "key").take_all()) == [0]
    assert sorted(r["id"] for r in anti_join_filter(ds, {1, None}, "key").take_all()) == [1, 2]
