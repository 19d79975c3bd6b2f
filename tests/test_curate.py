"""End-to-end curation chain (pipelines/curate.py): filter → scrub →
boilerplate strip → exact dedup → near-dedup, with phase checkpoints."""

from __future__ import annotations

import glob
import os

import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus_with_dups(tmp_path_factory):
    """Synthetic corpus + an extra shard of exact-duplicate pages whose
    urls sort AFTER the originals (so keep-min-id keeps the originals)."""
    import pyarrow.parquet as pq

    from pii_detection_test_ray.sources.corpus import CorpusConfig, write_corpus

    root = tmp_path_factory.mktemp("curate")
    corpus = str(root / "corpus")
    write_corpus(corpus, CorpusConfig(n_docs=60), shards=2)
    shard0 = sorted(glob.glob(f"{corpus}/documents/*.parquet"))[0]
    t = pq.read_table(shard0).slice(0, 6)
    urls = [f"zz-dup-{i}" for i in range(t.num_rows)]
    import pyarrow as pa

    dup = t.set_column(
        t.schema.get_field_index("url"), "url", pa.array(urls, t.column("url").type)
    )
    pq.write_table(dup, f"{corpus}/documents/zz_dups.parquet")
    return corpus, urls


def _files(corpus):
    return sorted(glob.glob(f"{corpus}/documents/*.parquet"))


def test_curate_drops_planted_dups(ray_session, corpus_with_dups):
    from pii_detection_test_ray.pipelines.curate import curate_corpus

    corpus, dup_urls = corpus_with_dups
    out = curate_corpus(_files(corpus)).take_all()
    out_urls = {r["url"] for r in out}
    # every planted exact duplicate is gone, its original survived
    assert not (out_urls & set(dup_urls))
    assert len(out) > 0
    # curation only ever removes rows
    n_input = 66
    assert len(out) < n_input
    # scrubbed text still carries redactions somewhere in the corpus
    assert any("[" in (r["scrubbed_text"] or "") for r in out)


def test_curate_checkpoints_and_resumes(ray_session, corpus_with_dups, tmp_path):
    from pii_detection_test_ray.pipelines.curate import curate_corpus

    corpus, dup_urls = corpus_with_dups
    ck = str(tmp_path / "ck")
    first = sorted(r["url"] for r in curate_corpus(_files(corpus), checkpoint_dir=ck).take_all())
    for phase in ("phase1_filtered", "phase2_cleaned", "phase3_exact"):
        assert os.path.exists(os.path.join(ck, phase, "_complete"))
    # second run streams from the existing checkpoints and agrees exactly
    second = sorted(r["url"] for r in curate_corpus(_files(corpus), checkpoint_dir=ck).take_all())
    assert first == second
    # and matches the non-checkpointed path
    direct = sorted(r["url"] for r in curate_corpus(_files(corpus)).take_all())
    assert first == direct


def test_curate_regenerates_incomplete_phase(ray_session, corpus_with_dups, tmp_path):
    """Crash probe: a phase directory without its _complete marker (the
    atomic-write contract) is junk from a dead run — curate must rewrite
    it and still produce the exact same corpus."""
    import shutil

    from pii_detection_test_ray.pipelines.curate import curate_corpus

    corpus, _ = corpus_with_dups
    ck = str(tmp_path / "ck")
    first = sorted(
        r["url"] for r in curate_corpus(_files(corpus), checkpoint_dir=ck).take_all()
    )
    # simulate a crash mid-phase-2: marker gone, stale parquet left behind
    phase2 = os.path.join(ck, "phase2_cleaned")
    os.remove(os.path.join(phase2, "_complete"))
    parts = [f for f in os.listdir(phase2) if f.endswith(".parquet")]
    os.remove(os.path.join(phase2, parts[0]))  # truncated output
    again = sorted(
        r["url"] for r in curate_corpus(_files(corpus), checkpoint_dir=ck).take_all()
    )
    assert again == first
    assert os.path.exists(os.path.join(phase2, "_complete"))
