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


class CombinedModelBatcher:
    """LangID + perplexity in ONE actor pool.

    Semantically identical to chaining LangIdBatcher → PerplexityBatcher;
    physically it halves the actor-pool boundaries (each boundary is an
    object-store hop the streaming executor can't fuse across). The bench
    path uses this; the default pipeline keeps the two stages separate for
    per-stage sizing on real clusters."""

    def __init__(self) -> None:
        from ..functions.langmodels import build_default_ppl_model

        self.langid = CharNgramLangID()
        self.ppl = build_default_ppl_model()

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs: list[str] = []
        confs: list[float] = []
        ppls: list[float] = []
        for text in batch.column("text").to_pylist():
            lang, conf = self.langid.classify(text)
            langs.append(lang)
            confs.append(round(conf, 6))
            ppls.append(round(self.ppl.log_perplexity(text), 6))
        return (
            batch.append_column("pred_lang", pa.array(langs, pa.string()))
            .append_column("lang_confidence", pa.array(confs, pa.float64()))
            .append_column("log_perplexity", pa.array(ppls, pa.float64()))
        )
