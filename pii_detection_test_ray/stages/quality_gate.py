"""Quality gate stage: stateless heuristic features + keep/drop decision.

The reference's implicit keep signal is the perfect-case flag
(reference: run_pii_evaluation.py:523); here it is the explicit web-corpus
gate required by the north rule: length / symbol-ratio / repetition
heuristics combined with the actor-pool model signals (lang confidence,
perplexity) into ``keep: bool`` + ``drop_reasons: list<string>``.

``quality_features_batch`` can run before the model stages (it needs only
``text``); ``gate_batch`` runs after them (needs ``lang_confidence`` and
``log_perplexity``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.quality import (
    QualityConfig,
    heuristic_reasons,
    model_reasons,
    quality_features,
)

_FEATURE_COLS = (
    "q_n_chars",
    "q_n_words",
    "q_symbol_ratio",
    "q_distinct_word_ratio",
    "q_duplicate_line_ratio",
    "q_toxicity_ratio",
)


def quality_features_batch(batch: pa.Table) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in _FEATURE_COLS}
    for text in batch.column("text").to_pylist():
        feats = quality_features(text)
        for name in _FEATURE_COLS:
            cols[name].append(feats[name])
    for name in _FEATURE_COLS:
        typ = pa.int64() if name in ("q_n_chars", "q_n_words") else pa.float64()
        batch = batch.append_column(name, pa.array(cols[name], typ))
    return batch


class GateBatcher:
    """Config-carrying gate; stateless, but a callable class so thresholds
    travel as constructor args instead of a closure re-pickled per task."""

    def __init__(self, cfg: QualityConfig | None = None) -> None:
        self.cfg = cfg or QualityConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keeps: list[bool] = []
        reasons_col: list[list[str]] = []
        feats_lists = {name: batch.column(name).to_pylist() for name in _FEATURE_COLS}
        lang_conf = batch.column("lang_confidence").to_pylist()
        log_ppl = batch.column("log_perplexity").to_pylist()
        pred_langs = batch.column("pred_lang").to_pylist()
        n = batch.num_rows
        for i in range(n):
            feats = {name: feats_lists[name][i] for name in _FEATURE_COLS}
            reasons = heuristic_reasons(feats, self.cfg) + model_reasons(
                lang_conf[i], log_ppl[i], self.cfg, pred_lang=pred_langs[i]
            )
            keeps.append(not reasons)
            reasons_col.append(reasons)
        return batch.append_column("keep", pa.array(keeps, pa.bool_())).append_column(
            "drop_reasons", pa.array(reasons_col, pa.list_(pa.string()))
        )
