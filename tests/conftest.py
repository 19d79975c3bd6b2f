from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (local mode, 4 CPUs)."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    # Tiny test tables: don't let the 200-block read minimum turn every
    # groupby into a 200-partition shuffle of crumbs.
    ctx = ray.data.DataContext.get_current()
    ctx.read_op_min_num_blocks = 4
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Shared 160-doc synthetic corpus on disk (documents/ + labels.parquet)."""
    from pii_detection_test_ray.sources.corpus import CorpusConfig, write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, CorpusConfig(n_docs=160), shards=4)
    return out
