"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship quality-filter + PII-scrub pipeline (SURVEY.md §7)
over the sf0.001 documents table (wrapped into the input_hint page shape)
unioned with the synthetic Korean PII corpus.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ the dedup / similarity / multimodal / text-analysis
additions); SQL oracles for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def _configure_data_context() -> None:
    """Ray Data context knobs for this engine's outputs: list<string> PII
    columns must stay plain object columns in pandas (the TensorArray
    extension cast raises on ragged string lists)."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_tensor_extension_casting = False


_configure_data_context()


def _wrap_testdata_as_pages(sf_dir: str):
    """documents(doc_id, text, ...) → input_hint pages (url, warc_ts, html)."""
    import pyarrow as pa
    import ray.data

    from pii_detection_test_ray.sources.corpus import render_html

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base_ts = datetime(2024, 6, 1)

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "url": pa.array(
                    [f"https://testdata.example-archive.kr/doc/{i}" for i in ids],
                    pa.string(),
                ),
                "warc_ts": pa.array([base_ts] * len(ids), pa.timestamp("us")),
                "html": pa.array(
                    [render_html(t, i, f"doc {i}") for i, t in zip(ids, texts)],
                    pa.binary(),
                ),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from pii_detection_test_ray.pipelines.quality_filter import build_pipeline, read_pages
    from pii_detection_test_ray.pipelines.queries import synthetic_corpus_dir

    synth = read_pages(f"{synthetic_corpus_dir()}/documents")
    pages = _wrap_testdata_as_pages(SF0001).union(synth)
    return build_pipeline(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    from pii_detection_test_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pii_detection_test_ray.pipelines.sql_oracles import ORACLES

    return dict(ORACLES)
