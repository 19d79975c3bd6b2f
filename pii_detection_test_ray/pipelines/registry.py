"""Config-driven pipeline assembly — the engine's user-extension surface.

The reference exposes its variability as CLI flags, prompt registries and
bash model matrices (reference: run_pii_evaluation.py:952-987 /:422-429,
run_all_benchmarks.sh:21-37). The engine equivalent: a registry of named
stages (each a stateless batch fn or an actor class + default knobs), and
``build_from_config`` which assembles a Dataset pipeline from a plain list
of ``{"stage": name, **overrides}`` dicts — pipelines are data, not code.

    pipeline = build_from_config(source, [
        {"stage": "extract"},
        {"stage": "drop_html"},
        {"stage": "models", "concurrency": [4, 4]},
        {"stage": "quality_features"},
        {"stage": "gate", "quality": {"min_chars": 100}},
        {"stage": "pii_scrub"},
    ])
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import ray.data

from ..functions.quality import QualityConfig
from ..stages.classifier import NameDisambiguator
from ..stages.detect import pii_scrub_batch
from ..stages.extract import drop_html, extract_batch
from ..stages.langid import CombinedModelBatcher, LangIdBatcher
from ..stages.perplexity import PerplexityBatcher
from ..stages.quality_gate import GateBatcher, quality_features_batch
from ..stages.textstats import SignatureBatcher, textstats_batch


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One registered stage: either a stateless batch fn (tasks) or an
    actor class (pool), plus default map_batches kwargs."""

    fn: Callable | type
    is_actor: bool = False
    defaults: dict[str, Any] = dataclasses.field(default_factory=dict)


STAGES: dict[str, StageSpec] = {
    "extract": StageSpec(extract_batch),
    "drop_html": StageSpec(drop_html),
    "langid": StageSpec(
        LangIdBatcher, is_actor=True, defaults={"concurrency": (1, 8), "num_cpus": 0.5}
    ),
    "perplexity": StageSpec(
        PerplexityBatcher,
        is_actor=True,
        defaults={"concurrency": (1, 8), "num_cpus": 0.5},
    ),
    "models": StageSpec(  # fused langid+perplexity
        CombinedModelBatcher,
        is_actor=True,
        defaults={"concurrency": (1, 8), "num_cpus": 0.5},
    ),
    "quality_features": StageSpec(quality_features_batch),
    "gate": StageSpec(GateBatcher, is_actor=False),  # config-carrying callable
    "pii_scrub": StageSpec(pii_scrub_batch),
    "name_disambiguator": StageSpec(
        NameDisambiguator,
        is_actor=True,
        defaults={"concurrency": (1, 4), "num_cpus": 0.5},
    ),
    "textstats": StageSpec(textstats_batch),
    "signatures": StageSpec(
        SignatureBatcher, is_actor=True, defaults={"concurrency": (1, 4), "num_cpus": 0.5}
    ),
}

_MAP_KWARGS = {"concurrency", "num_cpus", "batch_size", "num_gpus"}


def build_from_config(
    source: ray.data.Dataset, config: list[dict[str, Any]], batch_size: int = 256
) -> ray.data.Dataset:
    """Assemble a pipeline from a list of stage configs. Unknown stage names
    raise; per-stage overrides split into map_batches kwargs vs constructor
    kwargs automatically."""
    ds = source
    for entry in config:
        entry = dict(entry)
        name = entry.pop("stage")
        if name not in STAGES:
            raise KeyError(
                f"unknown stage {name!r}; registered: {sorted(STAGES)}"
            )
        spec = STAGES[name]
        map_kwargs: dict[str, Any] = {"batch_format": "pyarrow", "batch_size": batch_size}
        map_kwargs.update(spec.defaults)
        ctor_kwargs: dict[str, Any] = {}
        for k, v in entry.items():
            if k in _MAP_KWARGS:
                map_kwargs[k] = tuple(v) if k == "concurrency" and isinstance(v, list) else v
            else:
                ctor_kwargs[k] = v
        if name == "gate":
            quality = ctor_kwargs.pop("quality", None)
            cfg = QualityConfig(**quality) if isinstance(quality, dict) else (
                quality or QualityConfig()
            )
            ds = ds.map_batches(GateBatcher(cfg), **map_kwargs)
        elif spec.is_actor:
            if ctor_kwargs:
                map_kwargs["fn_constructor_kwargs"] = ctor_kwargs
            ds = ds.map_batches(spec.fn, **map_kwargs)
        else:
            if ctor_kwargs:
                map_kwargs["fn_kwargs"] = ctor_kwargs
            ds = ds.map_batches(spec.fn, **map_kwargs)
    return ds
