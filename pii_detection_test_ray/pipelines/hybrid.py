"""Hybrid merge-policy evaluation (the reference's strategy search).

The reference merges LLM predictions × regex predictions under several
policies and ranks them by micro-F1 (reference: run_hybrid_eval.py:98-124,
hybrid_analysis.py:330-506, hybrid_analysis_deep.py:140-201). The engine
analog: the *model path* is the regex output with the 이름 category replaced
by the classifier-confirmed subset (the disambiguator plays the reference's
LLM role, reference M1), merged with the *raw regex path* under each policy
in functions/metrics.MERGE_POLICIES, all scored against golden labels in
one distributed pass (policy × document partials → tiny groupby).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.metrics import (
    MERGE_POLICIES,
    category_metrics,
    document_metrics,
    merge_union_categories,
    prf1,
)
from ..functions.pii_regex import CATEGORY_SLUGS, PII_CATEGORIES
from ..stages.eval_agg import load_label_index


def _extract_preds(batch: pa.Table):
    """Shared batch unpacking: (urls, regex_pred_fn, model_pred_fn)."""
    urls = batch.column("url").to_pylist()
    regex_cols = {
        cat: batch.column(f"pii_{CATEGORY_SLUGS[cat]}").to_pylist()
        for cat in PII_CATEGORIES
    }
    confirmed_names = batch.column("pii_name_confirmed").to_pylist()

    def preds(i: int):
        regex_pred = {
            cat: (list(v) if v is not None else None)
            for cat, v in ((c, regex_cols[c][i]) for c in PII_CATEGORIES)
        }
        model_pred = dict(regex_pred)
        conf = confirmed_names[i]
        model_pred["이름"] = list(conf) if conf else None
        return model_pred, regex_pred

    return urls, preds


class _PolicyScorer:
    """One input row → one partial metric row per merge policy. ``extra``
    carries learned policies (strategies A/F — category sets computed from a
    first pass) on top of the static MERGE_POLICIES registry."""

    def __init__(self, labels_ref, extra=None) -> None:
        self.labels = ray.get(labels_ref)
        self.policies = dict(MERGE_POLICIES)
        if extra:
            self.policies.update(extra)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, preds = _extract_preds(batch)
        out = {"policy": [], "tp": [], "fp": [], "fn": [], "perfect": []}
        for i, url in enumerate(urls):
            entry = self.labels.get(url)
            if entry is None:
                continue
            expected = entry[0]
            model_pred, regex_pred = preds(i)
            for policy, merge in self.policies.items():
                merged = merge(model_pred, regex_pred)
                m = document_metrics(expected, merged)
                out["policy"].append(policy)
                out["tp"].append(m["total_tp"])
                out["fp"].append(m["total_fp"])
                out["fn"].append(m["total_fn"])
                out["perfect"].append(int(m["micro_f1"] == 1.0))
        return pa.table(
            {
                "policy": pa.array(out["policy"], pa.string()),
                "tp": pa.array(out["tp"], pa.int64()),
                "fp": pa.array(out["fp"], pa.int64()),
                "fn": pa.array(out["fn"], pa.int64()),
                "perfect": pa.array(out["perfect"], pa.int64()),
            }
        )


def policy_comparison(
    pii_ds: ray.data.Dataset,
    labels_path: str,
    extra_policies: dict | None = None,
) -> ray.data.Dataset:
    """Rows: (policy, n_docs, n_perfect, tp, fp, fn, precision, recall, f1),
    one per merge policy, computed in a single distributed pass."""
    labels_ref = ray.put(load_label_index(labels_path))
    partials = pii_ds.map_batches(
        _PolicyScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=0.5,
        fn_constructor_kwargs={"labels_ref": labels_ref, "extra": extra_policies},
    )
    agg = partials.groupby("policy").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn"), Sum("perfect"), Count()
    )

    def finalize(batch: pa.Table) -> pa.Table:
        tps = batch.column("sum(tp)").to_pylist()
        fps = batch.column("sum(fp)").to_pylist()
        fns = batch.column("sum(fn)").to_pylist()
        ps, rs, f1s = [], [], []
        for tp, fp, fn in zip(tps, fps, fns):
            p, r, f1 = prf1(tp, fp, fn)
            ps.append(round(p, 4))
            rs.append(round(r, 4))
            f1s.append(round(f1, 4))
        return pa.table(
            {
                "policy": batch.column("policy"),
                "n_docs": batch.column("count()"),
                "n_perfect": batch.column("sum(perfect)"),
                "tp": pa.array(tps, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
                "fn": pa.array(fns, pa.int64()),
                "precision": pa.array(ps, pa.float64()),
                "recall": pa.array(rs, pa.float64()),
                "f1": pa.array(f1s, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


class _PolicyCategoryScorer:
    """Stage 1 of the learned strategies: per-(policy, pii_category) partial
    tp/fp/fn rows for a fixed small set of base policies."""

    _BASE = ("primary_only", "secondary_only", "union")

    def __init__(self, labels_ref) -> None:
        self.labels = ray.get(labels_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, preds = _extract_preds(batch)
        out = {"policy": [], "pii_category": [], "tp": [], "fp": [], "fn": []}
        for i, url in enumerate(urls):
            entry = self.labels.get(url)
            if entry is None:
                continue
            expected = entry[0]
            model_pred, regex_pred = preds(i)
            for policy in self._BASE:
                merged = MERGE_POLICIES[policy](model_pred, regex_pred)
                per_cat = category_metrics(expected, merged)
                for cat in PII_CATEGORIES:
                    cm = per_cat[cat]
                    out["policy"].append(policy)
                    out["pii_category"].append(cat)
                    out["tp"].append(cm["tp"])
                    out["fp"].append(cm["fp"])
                    out["fn"].append(cm["fn"])
        return pa.table(
            {
                "policy": pa.array(out["policy"], pa.string()),
                "pii_category": pa.array(out["pii_category"], pa.string()),
                "tp": pa.array(out["tp"], pa.int64()),
                "fp": pa.array(out["fp"], pa.int64()),
                "fn": pa.array(out["fn"], pa.int64()),
            }
        )


def per_category_policy_rollup(
    pii_ds: ray.data.Dataset, labels_path: str
) -> ray.data.Dataset:
    """Rows: (policy, pii_category, tp, fp, fn, precision, recall, f1) for
    the three base policies — the distributed first pass both learned
    strategies read (result is policies × categories, output-sized)."""
    labels_ref = ray.put(load_label_index(labels_path))
    partials = pii_ds.map_batches(
        _PolicyCategoryScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=0.5,
        fn_constructor_kwargs={"labels_ref": labels_ref},
    )
    agg = partials.groupby(["policy", "pii_category"]).aggregate(
        Sum("tp"), Sum("fp"), Sum("fn")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        tps = batch.column("sum(tp)").to_pylist()
        fps = batch.column("sum(fp)").to_pylist()
        fns = batch.column("sum(fn)").to_pylist()
        stats = [prf1(tp, fp, fn) for tp, fp, fn in zip(tps, fps, fns)]
        return pa.table(
            {
                "policy": batch.column("policy"),
                "pii_category": batch.column("pii_category"),
                "tp": pa.array(tps, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
                "fn": pa.array(fns, pa.int64()),
                "precision": pa.array([round(s[0], 4) for s in stats], pa.float64()),
                "recall": pa.array([round(s[1], 4) for s in stats], pa.float64()),
                "f1": pa.array([round(s[2], 4) for s in stats], pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def learned_policies(
    pii_ds: ray.data.Dataset,
    labels_path: str,
    precision_floor: float = 0.80,
) -> dict:
    """Strategies A and F (reference: hybrid_analysis.py:320-336,
    hybrid_analysis_deep.py:130-163): category sets LEARNED from a first
    distributed pass, returned as extra merge policies for
    ``policy_comparison``.

    * ``high_precision_union`` (A): union on categories where the secondary
      (raw regex) precision exceeds ``precision_floor``.
    * ``f1_improving_union`` (F): union on categories where union beats
      primary-only F1.
    """
    import functools

    rows = per_category_policy_rollup(pii_ds, labels_path).take_all()
    by_policy: dict[str, dict[str, dict]] = {}
    for r in rows:
        by_policy.setdefault(r["policy"], {})[r["pii_category"]] = r

    high_prec = frozenset(
        cat
        for cat, r in by_policy.get("secondary_only", {}).items()
        if (r["tp"] + r["fp"]) > 0 and r["precision"] > precision_floor
    )
    f1_improving = frozenset(
        cat
        for cat, r in by_policy.get("union", {}).items()
        if r["f1"] > by_policy.get("primary_only", {}).get(cat, {"f1": 0.0})["f1"]
    )
    return {
        "high_precision_union": functools.partial(
            merge_union_categories, union_cats=high_prec
        ),
        "f1_improving_union": functools.partial(
            merge_union_categories, union_cats=f1_improving
        ),
    }
