"""Language-ID stage: a stateful actor pool.

The classifier model is built once per actor in ``__init__`` (the fastText
role in the north star; the reference's analogous stateful stage is the vLLM
client built once and shared — reference: run_pii_evaluation.py:1024) and
applied per Arrow batch in ``__call__``. Use as::

    ds.map_batches(LangIdBatcher, concurrency=(2, 8), batch_size=256,
                   batch_format="pyarrow")
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.langmodels import CharNgramLangID


class LangIdBatcher:
    def __init__(self) -> None:
        self.model = CharNgramLangID()

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs: list[str] = []
        confs: list[float] = []
        for text in batch.column("text").to_pylist():
            lang, conf = self.model.classify(text)
            langs.append(lang)
            confs.append(round(conf, 6))
        return batch.append_column(
            "pred_lang", pa.array(langs, pa.string())
        ).append_column("lang_confidence", pa.array(confs, pa.float64()))
