"""As-of join vs an in-process brute-force reference."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _sides(seed=5, n_left=200, n_right=40, n_keys=6):
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    left = [
        {"k": rng.randint(0, n_keys - 1),
         "t": base + timedelta(minutes=rng.randint(0, 5000)), "lv": i}
        for i in range(n_left)
    ]
    right, seen = [], set()
    for i in range(n_right):
        r = {"k": rng.randint(0, n_keys - 1),
             "t2": base + timedelta(minutes=rng.randint(0, 5000)), "rv": f"r{i}"}
        if (r["k"], r["t2"]) not in seen:  # unique per (key, ts): determinism
            seen.add((r["k"], r["t2"]))
            right.append(r)
    return left, right


def _brute(left, right, inner):
    out = []
    for l in left:
        cands = [r for r in right if r["k"] == l["k"] and r["t2"] <= l["t"]]
        if cands:
            best = max(cands, key=lambda r: r["t2"])
            out.append((l["k"], l["lv"], best["rv"]))
        elif not inner:
            out.append((l["k"], l["lv"], None))
    return sorted(out)


@pytest.mark.parametrize("inner", [True, False])
def test_asof_join_matches_bruteforce(ray_session, inner):
    from pii_detection_test_ray.stages.asof import asof_join

    left, right = _sides()
    lds = ray.data.from_items(left, override_num_blocks=3)
    rds = ray.data.from_items(right, override_num_blocks=2)
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in asof_join(lds, rds, "k", "t", "t2", inner=inner).take_all()
    )
    assert got == _brute(left, right, inner)


@pytest.mark.parametrize("inner", [True, False])
def test_asof_join_windowed_matches_bruteforce(ray_session, inner):
    """span_hours=1 over ~83 hours of events: scores of window cuts, so
    most matches cross a boundary and ride the carry hand-off."""
    from pii_detection_test_ray.stages.asof import asof_join

    left, right = _sides()
    lds = ray.data.from_items(left, override_num_blocks=3)
    rds = ray.data.from_items(right, override_num_blocks=2)
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in asof_join(
            lds, rds, "k", "t", "t2", inner=inner, span_hours=1
        ).take_all()
    )
    assert got == _brute(left, right, inner)


def test_asof_join_windowed_skewed_key(ray_session):
    """One key owns ~all rows on both sides — the case that pins a single
    reducer on the plain path. The windowed path splits it by time and
    still matches brute force, including left rows whose only match is
    several empty windows back."""
    from pii_detection_test_ray.stages.asof import asof_join

    base = datetime(2024, 1, 1)
    left = [
        {"k": 7, "t": base + timedelta(minutes=13 * i), "lv": i}
        for i in range(400)
    ] + [{"k": 1, "t": base, "lv": 1000}]
    # sparse right side: long stretches of windows with no right rows
    right = [
        {"k": 7, "t2": base + timedelta(minutes=900 * j + 1), "rv": f"r{j}"}
        for j in range(6)
    ]
    lds = ray.data.from_items(left, override_num_blocks=4)
    rds = ray.data.from_items(right, override_num_blocks=2)
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in asof_join(
            lds, rds, "k", "t", "t2", inner=False, span_hours=1
        ).take_all()
    )
    assert got == _brute(left, right, False)


def test_asof_join_key_without_right_rows(ray_session):
    """Keys that never appear on the right: dropped under inner, null under
    left join."""
    from pii_detection_test_ray.stages.asof import asof_join

    base = datetime(2024, 1, 1)
    left = [{"k": 1, "t": base, "lv": 0}, {"k": 2, "t": base, "lv": 1}]
    right = [{"k": 1, "t2": base - timedelta(hours=1), "rv": "x"}]
    lds = ray.data.from_items(left, override_num_blocks=1)
    rds = ray.data.from_items(right, override_num_blocks=1)
    inner = asof_join(lds, rds, "k", "t", "t2", inner=True).take_all()
    assert [(r["k"], r["rv"]) for r in inner] == [(1, "x")]
    outer = sorted(
        (r["k"], r["rv"])
        for r in asof_join(lds, rds, "k", "t", "t2", inner=False).take_all()
    )
    assert outer == [(1, "x"), (2, None)]


def test_asof_join_date32_timestamps(ray_session):
    """DATE-typed ts columns (e.g. TPC-H o_orderdate as date32) must work:
    date32 has no direct int64 cast in Arrow — regression for the
    ArrowNotImplementedError path."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.asof import asof_join

    lds = ray.data.from_arrow(
        pa.table({"k": [1, 1], "t": pa.array([19000, 19010], pa.date32()),
                  "lv": [0, 1]})
    )
    rds = ray.data.from_arrow(
        pa.table({"k": [1], "t2": pa.array([19005], pa.date32()), "rv": ["x"]})
    )
    got = sorted(
        (r["lv"], r["rv"])
        for r in asof_join(lds, rds, "k", "t", "t2", inner=False).take_all()
    )
    assert got == [(0, None), (1, "x")]


def test_asof_join_null_timestamps_sort_last(ray_session):
    """DuckDB ASOF JOIN semantics on nulls (verified on null-bearing
    tables, round 4): NULL timestamps sort LAST on both sides — a null-ts
    LEFT row matches its key's overall latest right (here the null-ts
    right), a real-ts left never reaches a null-ts right, and NULL KEYS
    never match (unmatched under left join)."""
    import pyarrow as pa

    from pii_detection_test_ray.stages.asof import asof_join

    lds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, None], pa.int64()),
                  "t": pa.array([None, 200, 150], pa.timestamp("us")),
                  "lv": [0, 1, 2]})
    )
    rds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1], pa.int64()),
                  "t2": pa.array([100, None], pa.timestamp("us")),
                  "rv": ["x", "nullts"]})
    )
    inner = sorted(
        (r["lv"], r["rv"])
        for r in asof_join(lds, rds, "k", "t", "t2", inner=True).take_all()
    )
    assert inner == [(0, "nullts"), (1, "x")]
    outer = sorted(
        (r["lv"], r["rv"])
        for r in asof_join(lds, rds, "k", "t", "t2", inner=False).take_all()
    )
    assert outer == [(0, "nullts"), (1, "x"), (2, None)]


def test_latest_per_key_ts(ray_session):
    from pii_detection_test_ray.stages.asof import latest_per_key_ts

    base = datetime(2024, 1, 1)
    rows = [
        {"k": 1, "t": base, "id": 10, "v": "a"},
        {"k": 1, "t": base, "id": 30, "v": "b"},  # max id wins
        {"k": 1, "t": base + timedelta(days=1), "id": 20, "v": "c"},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    got = sorted(
        (r["k"], r["t"], r["v"])
        for r in latest_per_key_ts(ds, "k", "t", "id").take_all()
    )
    assert [g[2] for g in got] == ["b", "c"]


def test_auto_flips_to_windowed_on_hot_key(ray_session):
    """Round-4 verdict ask #7: a one-key-holds-all event log must be safe
    through the DEFAULT entry point — span_hours='auto' probes the key
    distribution and flips to the windowed plan by itself (no manual
    flag), and the result equals both the brute force and the forced
    plain plan."""
    from datetime import datetime, timedelta

    from pii_detection_test_ray.stages.asof import _auto_span_hours, asof_join

    base = datetime(2024, 1, 1)
    left = [
        {"k": 7, "t": base + timedelta(minutes=3 * i), "lv": i}
        for i in range(2000)
    ]
    right = [
        {"k": 7, "t2": base + timedelta(minutes=60 * j), "rv": f"r{j}"}
        for j in range(100)
    ]
    lds = ray.data.from_items(left, override_num_blocks=4)
    rds = ray.data.from_items(right, override_num_blocks=2)

    # The probe must detect the hot key at this budget and pick a span.
    span = _auto_span_hours(lds, rds, "k", "t", "t2", max_bucket_bytes=4096)
    assert span is not None and span >= 1

    auto = sorted(
        (r["lv"], r["rv"])
        for r in asof_join(
            lds, rds, "k", "t", "t2", inner=True, max_bucket_bytes=4096
        ).take_all()
    )
    plain = sorted(
        (r["lv"], r["rv"])
        for r in asof_join(
            lds, rds, "k", "t", "t2", inner=True, span_hours=None
        ).take_all()
    )
    brute = sorted(
        (l["lv"], max(
            (r for r in right if r["t2"] <= l["t"]),
            key=lambda r: r["t2"],
        )["rv"])
        for l in left
        if any(r["t2"] <= l["t"] for r in right)
    )
    assert auto == plain == brute

    # Well-distributed keys at the default budget: the probe declines.
    spread = ray.data.from_items(
        [{"k": i % 50, "t": base + timedelta(minutes=i), "lv": i}
         for i in range(500)]
    )
    assert (
        _auto_span_hours(spread, rds, "k", "t", "t2", 128 << 20) is None
    )
