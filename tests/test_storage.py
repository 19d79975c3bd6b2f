"""Storage-side bucketing: write-once hash partitioning + zero-shuffle
aligned bucket joins (stages/storage.py)."""

from __future__ import annotations

import json
import os

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _write_sides(tmp_path, num_buckets=8):
    from pii_detection_test_ray.stages.storage import write_bucketed

    left_rows = [{"k": i % 23, "lv": i} for i in range(200)]
    right_rows = [{"k": k, "rv": f"r{k}"} for k in range(17)]  # keys 17..22 unmatched
    lp = write_bucketed(
        ray.data.from_items(left_rows, override_num_blocks=3),
        str(tmp_path / "left"),
        key="k",
        num_buckets=num_buckets,
    )
    rp = write_bucketed(
        ray.data.from_items(right_rows, override_num_blocks=1),
        str(tmp_path / "right"),
        key="k",
        num_buckets=num_buckets,
    )
    return lp, rp, left_rows, right_rows


def test_bucketed_write_then_join_matches_inner_join(ray_session, tmp_path):
    from pii_detection_test_ray.stages.storage import join_bucketed

    lp, rp, left_rows, _ = _write_sides(tmp_path)
    out = join_bucketed(lp, rp, key="k").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    expected = sorted(
        (l["k"], l["lv"], f"r{l['k']}") for l in left_rows if l["k"] < 17
    )
    assert got == expected


def test_bucketed_layout_is_aligned_hive_partitions(ray_session, tmp_path):
    """Bucket b on the left can only match bucket b on the right: verify the
    on-disk partitioning really is by the shared bucket hash, and that a
    manifest records the spec."""
    import pyarrow.parquet as pq

    from pii_detection_test_ray.functions.hashing import bucket_of

    lp, rp, _, _ = _write_sides(tmp_path)
    for path in (lp, rp):
        spec = json.load(open(os.path.join(path, "_bucketing.json")))
        assert spec == {"key": "k", "num_buckets": 8}
        for name in os.listdir(path):
            if not name.startswith("__bucket="):
                continue
            b = int(name.split("=")[1])
            t = pq.read_table(os.path.join(path, name))
            assert "__bucket" not in t.column_names  # key lives in the path
            assert all(bucket_of(k, 8) == b for k in t.column("k").to_pylist())


def test_join_bucketed_rejects_mismatched_spec(ray_session, tmp_path):
    from pii_detection_test_ray.stages.storage import join_bucketed, write_bucketed

    a = write_bucketed(
        ray.data.from_items([{"k": 1, "x": 1}], override_num_blocks=1),
        str(tmp_path / "a"),
        key="k",
        num_buckets=4,
    )
    b = write_bucketed(
        ray.data.from_items([{"k": 1, "y": 2}], override_num_blocks=1),
        str(tmp_path / "b"),
        key="k",
        num_buckets=8,
    )
    with pytest.raises(ValueError, match="bucketing mismatch"):
        join_bucketed(a, b, key="k")
    with pytest.raises(ValueError, match="bucketing mismatch"):
        join_bucketed(a, a, key="other")


def test_join_bucketed_handles_empty_buckets(ray_session, tmp_path):
    """More buckets than distinct keys → some bucket dirs missing on one or
    both sides; the join must still produce the exact inner-join rows."""
    from pii_detection_test_ray.stages.storage import join_bucketed, write_bucketed

    lp = write_bucketed(
        ray.data.from_items([{"k": 1, "lv": 10}, {"k": 2, "lv": 20}]),
        str(tmp_path / "l"),
        key="k",
        num_buckets=32,
    )
    rp = write_bucketed(
        ray.data.from_items([{"k": 2, "rv": "x"}, {"k": 3, "rv": "y"}]),
        str(tmp_path / "r"),
        key="k",
        num_buckets=32,
    )
    out = join_bucketed(lp, rp, key="k").take_all()
    assert [(r["k"], r["lv"], r["rv"]) for r in out] == [(2, 20, "x")]


def test_bucketed_join_matches_duckdb_on_tpch_slice(ray_session, tmp_path):
    """End-to-end vs DuckDB on the sf0.001 tables: customer ⋈ orders on
    custkey through the storage-bucketed path."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("no testdata")
    from pii_detection_test_ray.stages.storage import join_bucketed, write_bucketed

    cust = ray.data.read_parquet(
        os.path.join(sf, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf, "orders.parquet"), columns=["o_custkey", "o_orderkey"]
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderkey"]),
        batch_format="pyarrow",
    )
    cp = write_bucketed(cust, str(tmp_path / "cust"), key="c_custkey", num_buckets=8)
    op = write_bucketed(orders, str(tmp_path / "ord"), key="c_custkey", num_buckets=8)
    got = sorted(
        (r["c_custkey"], r["o_orderkey"], r["c_mktsegment"])
        for r in join_bucketed(cp, op, key="c_custkey").take_all()
    )
    con = duckdb.connect()
    expected = sorted(
        tuple(row)
        for row in con.execute(
            f"""
            SELECT c.c_custkey, o.o_orderkey, c.c_mktsegment
            FROM read_parquet('{sf}/customer.parquet') c
            JOIN read_parquet('{sf}/orders.parquet') o ON o.o_custkey = c.c_custkey
            """
        ).fetchall()
    )
    assert got == expected


def test_join_bucketed_cross_width_keys(ray_session, tmp_path):
    """An int32 key on one side joins an int64 key on the other — the
    bucket hash already normalized widths; the per-bucket Arrow join now
    casts to a canonical key type instead of raising (round-3 advice)."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.storage import join_bucketed, write_bucketed

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int32()),
                  "a": ["w", "x", "y", "z"]})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 5], pa.int64()), "b": [20, 30, 50]})
    )
    lp = write_bucketed(left, str(tmp_path / "l"), key="k", num_buckets=4)
    rp = write_bucketed(right, str(tmp_path / "r"), key="k", num_buckets=4)
    got = sorted((r["k"], r["a"], r["b"]) for r in join_bucketed(lp, rp, key="k").take_all())
    assert got == [(2, "x", 20), (3, "y", 30)]


def test_compact_parquet_preserves_rows(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pii_detection_test_ray.stages.storage import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    for i in range(20):  # 20 crumb files
        pq.write_table(
            pa.table({"k": list(range(i * 10, i * 10 + 10))}),
            str(src / f"part-{i:03d}.parquet"),
        )
    out = tmp_path / "compact"
    stats = compact_parquet(str(src), str(out), target_mb=256)
    assert stats["files_in"] == 20 and stats["rows"] == 200
    assert stats["files_out"] < 20
    got = sorted(
        v
        for f in out.glob("*.parquet")
        for v in pq.read_table(str(f)).column("k").to_pylist()
    )
    assert got == list(range(200))


def test_compact_parquet_discovers_nested_shards(ray_session, tmp_path):
    """Hive-partitioned / nested shard layouts are compacted too — discovery
    is a recursive walk, not a top-level listing (round-3 advice)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pii_detection_test_ray.stages.storage import compact_parquet

    src = tmp_path / "store"
    for part in ("lang=en", "lang=ko/deep"):
        d = src / part
        d.mkdir(parents=True)
        for i in range(3):
            pq.write_table(pa.table({"k": [part + str(i)]}), str(d / f"{i}.parquet"))
    out = tmp_path / "compact"
    stats = compact_parquet(str(src), str(out), target_mb=256)
    assert stats == {"files_in": 6, "files_out": 1, "rows": 6}


def test_compact_parquet_guards_output_dir(ray_session, tmp_path):
    """Non-empty output dirs (appending writes would mix runs into the
    footer-derived stats) and outputs nested under the input (recursive
    discovery would re-ingest them) are refused loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pii_detection_test_ray.stages.storage import compact_parquet

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({"k": [1, 2]}), str(src / "a.parquet"))
    used = tmp_path / "used"
    used.mkdir()
    (used / "left.over").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        compact_parquet(str(src), str(used))
    with pytest.raises(ValueError, match="nests under"):
        compact_parquet(str(src), str(src / "out"))
