"""Perplexity stage: KenLM-style char-class trigram LM in an actor pool.

Model state (trigram/bigram count tables) is built once per actor in
``__init__``, never per batch; scoring is per Arrow batch. Use as::

    ds.map_batches(PerplexityBatcher, concurrency=(2, 8), batch_size=256,
                   batch_format="pyarrow")
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.langmodels import build_default_ppl_model


class PerplexityBatcher:
    def __init__(self) -> None:
        self.model = build_default_ppl_model()

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = [
            round(self.model.log_perplexity(t), 6)
            for t in batch.column("text").to_pylist()
        ]
        return batch.append_column("log_perplexity", pa.array(scores, pa.float64()))
