"""Evaluation layer: per-document metric columns + grouped rollups.

Reimplements the reference's aggregation semantics as Ray Data reductions
(reference: run_pii_evaluation.py:452-702):

* per-(doc,category) tp/fp/fn over stripped string sets  → long-format rows
  emitted inside ``map_batches`` (the partial/combiner step);
* per-category rollup (A3), per-difficulty rollup (A4), global micro (A5)
  → small ``groupby().aggregate(Sum(...))`` shuffles over integer columns;
* binary-presence confusion matrix (A6) → four boolean-sum aggregators;
* worst-k failures (O2) → ``filter → sort → limit``.

The golden-label side is small → broadcast once via ``ray.put`` (a
broadcast hash join on ``url``, reference J1: hybrid_analysis.py:31-33),
never a shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.metrics import document_metrics, prf1
from ..functions.normalize import normalize_expected
from ..functions.pii_regex import CATEGORY_SLUGS, PII_CATEGORIES


def load_label_index(labels_path: str) -> dict:
    """url → (expected 12-key dict, category, difficulty); the small side."""
    import pyarrow.parquet as pq

    table = pq.read_table(
        labels_path, columns=["url", "category", "difficulty", "expected_pii"]
    )
    index = {}
    for row in table.to_pylist():
        index[row["url"]] = (
            normalize_expected(row["expected_pii"]),
            row["category"],
            row["difficulty"],
        )
    return index


class MetricsEmitter:
    """Pipeline-output batch → long-format per-(doc,category) metric rows
    plus doc-level micro columns. Label index fetched from the object store
    once per actor."""

    def __init__(self, labels_ref) -> None:
        self.labels = ray.get(labels_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        preds_by_cat = {
            cat: batch.column(f"pii_{CATEGORY_SLUGS[cat]}").to_pylist()
            for cat in PII_CATEGORIES
        }
        out = {
            "url": [], "category": [], "difficulty": [], "pii_category": [],
            "tp": [], "fp": [], "fn": [],
            "bin_tp": [], "bin_tn": [], "bin_fp": [], "bin_fn": [],
            "micro_f1": [], "perfect": [],
        }
        for i, url in enumerate(urls):
            entry = self.labels.get(url)
            if entry is None:
                continue
            expected, category, difficulty = entry
            predicted = {
                cat: (list(v) if v is not None else None)
                for cat, v in ((c, preds_by_cat[c][i]) for c in PII_CATEGORIES)
            }
            m = document_metrics(expected, predicted)
            for cat in PII_CATEGORIES:
                cm = m["per_category"][cat]
                has_exp = bool(expected.get(cat))
                has_pred = bool(predicted.get(cat))
                out["url"].append(url)
                out["category"].append(category)
                out["difficulty"].append(difficulty)
                out["pii_category"].append(cat)
                out["tp"].append(cm["tp"])
                out["fp"].append(cm["fp"])
                out["fn"].append(cm["fn"])
                out["bin_tp"].append(int(has_exp and has_pred))
                out["bin_tn"].append(int(not has_exp and not has_pred))
                out["bin_fp"].append(int(not has_exp and has_pred))
                out["bin_fn"].append(int(has_exp and not has_pred))
                out["micro_f1"].append(m["micro_f1"])
                out["perfect"].append(int(m["micro_f1"] == 1.0))
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "category": pa.array(out["category"], pa.string()),
                "difficulty": pa.array(out["difficulty"], pa.string()),
                "pii_category": pa.array(out["pii_category"], pa.string()),
                "tp": pa.array(out["tp"], pa.int64()),
                "fp": pa.array(out["fp"], pa.int64()),
                "fn": pa.array(out["fn"], pa.int64()),
                "bin_tp": pa.array(out["bin_tp"], pa.int64()),
                "bin_tn": pa.array(out["bin_tn"], pa.int64()),
                "bin_fp": pa.array(out["bin_fp"], pa.int64()),
                "bin_fn": pa.array(out["bin_fn"], pa.int64()),
                "micro_f1": pa.array(out["micro_f1"], pa.float64()),
                "perfect": pa.array(out["perfect"], pa.int64()),
            }
        )


def metric_rows(pii_ds: ray.data.Dataset, labels_path: str) -> ray.data.Dataset:
    labels_ref = ray.put(load_label_index(labels_path))
    return pii_ds.map_batches(
        MetricsEmitter,
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=0.5,
        fn_constructor_kwargs={"labels_ref": labels_ref},
    )


def _finalize_prf(batch: pa.Table) -> pa.Table:
    tps = batch.column("sum(tp)").to_pylist()
    fps = batch.column("sum(fp)").to_pylist()
    fns = batch.column("sum(fn)").to_pylist()
    ps, rs, f1s = [], [], []
    for tp, fp, fn in zip(tps, fps, fns):
        p, r, f1 = prf1(tp, fp, fn)
        ps.append(round(p, 4))
        rs.append(round(r, 4))
        f1s.append(round(f1, 4))
    return (
        batch.append_column("precision", pa.array(ps, pa.float64()))
        .append_column("recall", pa.array(rs, pa.float64()))
        .append_column("f1", pa.array(f1s, pa.float64()))
    )


def rollup_by_pii_category(rows: ray.data.Dataset) -> ray.data.Dataset:
    """A3: per-PII-category summed tp/fp/fn + P/R/F1."""
    agg = rows.groupby("pii_category").aggregate(Sum("tp"), Sum("fp"), Sum("fn"))

    def clean_names(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [
                {"sum(tp)": "tp", "sum(fp)": "fp", "sum(fn)": "fn"}.get(c, c)
                for c in batch.column_names
            ]
        )

    return agg.map_batches(_finalize_prf, batch_format="pyarrow").map_batches(
        clean_names, batch_format="pyarrow"
    )


def rollup_by_difficulty(rows: ray.data.Dataset) -> ray.data.Dataset:
    """A4: per-difficulty counts, perfect-accuracy, P/R/F1. Doc-level values
    repeat once per pii_category row, so sums divide by 12."""
    agg = rows.groupby("difficulty").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn"), Sum("perfect"), Count()
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n_cats = len(PII_CATEGORIES)
        counts = [c // n_cats for c in batch.column("count()").to_pylist()]
        perfect = [p // n_cats for p in batch.column("sum(perfect)").to_pylist()]
        acc = [
            round(p / c, 4) if c else 0.0 for p, c in zip(perfect, counts)
        ]
        batch = (
            batch.append_column("n_docs", pa.array(counts, pa.int64()))
            .append_column("n_perfect", pa.array(perfect, pa.int64()))
            .append_column("accuracy", pa.array(acc, pa.float64()))
        )
        batch = _finalize_prf(batch)
        # Clean output schema: aliased partials fold into tp/fp/fn; the
        # doc-level count/perfect partials (12× inflated) drop entirely.
        batch = batch.drop_columns(["count()", "sum(perfect)"])
        return batch.rename_columns(
            [
                {"sum(tp)": "tp", "sum(fp)": "fp", "sum(fn)": "fn"}.get(c, c)
                for c in batch.column_names
            ]
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def confusion_by_pii_category(rows: ray.data.Dataset) -> ray.data.Dataset:
    """A6: binary presence confusion matrix per PII category."""
    agg = rows.groupby("pii_category").aggregate(
        Sum("bin_tp"), Sum("bin_tn"), Sum("bin_fp"), Sum("bin_fn")
    )

    def clean(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [c.removeprefix("sum(").removesuffix(")") if c.startswith("sum(")
             else c for c in batch.column_names]
        )

    return agg.map_batches(clean, batch_format="pyarrow")


def global_micro(rows: ray.data.Dataset) -> dict:
    """A5: corpus-level micro P/R/F1 + perfect accuracy (small result →
    driver-side dict)."""
    agg = rows.aggregate(Sum("tp"), Sum("fp"), Sum("fn"), Sum("perfect"), Count())
    tp, fp, fn = agg["sum(tp)"], agg["sum(fp)"], agg["sum(fn)"]
    n_cats = len(PII_CATEGORIES)
    n_docs = agg["count()"] // n_cats
    n_perfect = agg["sum(perfect)"] // n_cats
    p, r, f1 = prf1(tp, fp, fn)
    return {
        "micro_precision": round(p, 4),
        "micro_recall": round(r, 4),
        "micro_f1": round(f1, 4),
        "accuracy": round(n_perfect / n_docs, 4) if n_docs else 0.0,
        "n_docs": n_docs,
        "n_perfect": n_perfect,
        "total_tp": tp,
        "total_fp": fp,
        "total_fn": fn,
    }


def worst_failures(rows: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """O2: non-perfect docs, ascending micro-F1, first k (one row per doc)."""
    import pyarrow.compute as pc

    # One row per url (all selected columns are doc-level constants across
    # a url's category rows): bucketed vectorized keep-min instead of one
    # Python map_groups call per document.
    from .shuffle import _keep_min_bucketed

    doc_rows = _keep_min_bucketed(rows, ["url"], id_col="url")
    imperfect = doc_rows.map_batches(
        lambda t: t.filter(pc.less(t.column("micro_f1"), 1.0)),
        batch_format="pyarrow",
    )
    return (
        imperfect.sort("micro_f1")
        .limit(k)
        .select_columns(["url", "category", "difficulty", "micro_f1"])
    )
