"""Cross-document boilerplate line removal (stages/boilerplate.py)."""

from __future__ import annotations

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")

NAV = "Home | Products | Contact"
FOOTER = "© 2026 Example Corp. All rights reserved."


def _pages():
    rows = []
    for i in range(10):
        body = f"Unique article body {i} with its own content line."
        dup_in_doc = f"repeated inside doc {i}"
        rows.append(
            {
                "url": f"https://ex.com/{i}",
                "text": "\n".join(
                    [NAV, "", body, dup_in_doc, dup_in_doc, FOOTER]
                ),
            }
        )
    # one page without boilerplate at all
    rows.append({"url": "https://ex.com/solo", "text": "solo content\n\nmore"})
    return rows


def _oracle(rows, min_df):
    from pii_detection_test_ray.functions.quality import _BLANK_CHARS

    df: dict[str, int] = {}
    for r in rows:
        for ln in {l for l in r["text"].split("\n") if l.strip(_BLANK_CHARS)}:
            df[ln] = df.get(ln, 0) + 1
    boiler = {l for l, n in df.items() if n >= min_df}
    out = {}
    for r in rows:
        lines = r["text"].split("\n")
        kept = [
            l for l in lines if not l.strip(_BLANK_CHARS) or l not in boiler
        ]
        out[r["url"]] = ("\n".join(kept), len(lines) - len(kept))
    return out


def test_remove_boilerplate_matches_oracle(ray_session):
    from pii_detection_test_ray.stages.boilerplate import remove_boilerplate_lines

    rows = _pages()
    ds = ray.data.from_items(rows, override_num_blocks=3)
    got = {
        r["url"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_lines(ds, min_df=4).take_all()
    }
    expected = _oracle(rows, min_df=4)
    assert got == expected
    # Non-vacuous: nav+footer stripped everywhere, bodies intact, blank
    # lines and within-doc repeats (df=1 across docs) survive.
    clean0, removed0 = got["https://ex.com/0"]
    assert NAV not in clean0 and FOOTER not in clean0
    assert "Unique article body 0" in clean0
    assert clean0.count("repeated inside doc 0") == 2
    assert "" in clean0.split("\n")
    assert removed0 == 2
    assert got["https://ex.com/solo"][1] == 0


def test_boilerplate_cap_guard(ray_session):
    from pii_detection_test_ray.stages.boilerplate import remove_boilerplate_lines

    ds = ray.data.from_items(_pages(), override_num_blocks=2)
    with pytest.raises(ValueError, match="broadcast-small-side"):
        remove_boilerplate_lines(ds, min_df=4, max_boiler_lines=1)


def test_boilerplate_null_and_empty_text(ray_session):
    from pii_detection_test_ray.stages.boilerplate import remove_boilerplate_lines

    rows = [{"url": f"u{i}", "text": "shared line\nown " + str(i)} for i in range(4)]
    rows.append({"url": "empty", "text": ""})
    rows.append({"url": "null", "text": None})
    ds = ray.data.from_items(rows, override_num_blocks=2)
    got = {r["url"]: r for r in remove_boilerplate_lines(ds, min_df=4).take_all()}
    assert got["empty"]["clean_text"] == "" and got["empty"]["n_removed"] == 0
    assert got["null"]["clean_text"] == "" and got["null"]["n_removed"] == 0
    assert got["u0"]["clean_text"] == "own 0" and got["u0"]["n_removed"] == 1
