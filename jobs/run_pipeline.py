#!/usr/bin/env python
"""Cluster job entrypoint for the flagship quality-filter + PII-scrub
pipeline, submitted as::

    ray job submit --working-dir . -- python jobs/run_pipeline.py \
        --input /data/pages --output /data/filtered \
        --group-size 16 --batch-size 512

On a cluster ``ray.init()`` (no address) attaches to the running cluster the
job was submitted to; standalone it starts a local one. The run is resumable:
per-shard-group lineage manifests under ``<output>/_lineage`` are skipped on
restart (state/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="directory of input page Parquet shards")
    parser.add_argument("--output", required=True, help="output directory (partitioned, resumable)")
    parser.add_argument("--group-size", type=int, default=16, help="input shards per lineage unit")
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument(
        "--actors-per-model-stage", type=int, default=0,
        help="0 (default) = auto-size pools to the cluster CPU count "
             "(PipelineOptions.auto); >0 = fixed manual sizing",
    )
    parser.add_argument("--kept-only", action="store_true", help="write only keep=True rows")
    parser.add_argument(
        "--stages-json", default=None,
        help="path to a JSON list of {'stage': name, **overrides} dicts; "
             "when given, the pipeline is assembled from the stage registry "
             "(pipelines/registry.py) instead of the built-in flagship — "
             "pipelines are data, not code",
    )
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(logging_level="ERROR")

    from pii_detection_test_ray.pipelines.quality_filter import (
        PipelineOptions,
        build_pipeline,
        kept_corpus,
    )
    from pii_detection_test_ray.state.lineage import resumable_run

    if args.actors_per_model_stage <= 0:
        import dataclasses

        opts = dataclasses.replace(
            PipelineOptions.auto(), batch_size=args.batch_size
        )
    else:
        opts = PipelineOptions(
            batch_size=args.batch_size,
            langid_actors=(args.actors_per_model_stage, args.actors_per_model_stage),
            ppl_actors=(args.actors_per_model_stage, args.actors_per_model_stage),
            classifier_actors=(
                max(1, args.actors_per_model_stage // 2),
                max(1, args.actors_per_model_stage // 2),
            ),
            actor_num_cpus=1.0,
            fuse_model_stages=True,
        )

    if args.stages_json:
        from pii_detection_test_ray.pipelines.registry import build_from_config

        with open(args.stages_json) as f:
            stage_config = json.load(f)

        def pipeline(files: list[str]):
            ds = build_from_config(
                ray.data.read_parquet(files),
                stage_config,
                batch_size=args.batch_size,
            )
            return kept_corpus(ds) if args.kept_only else ds

    else:

        def pipeline(files: list[str]):
            ds = build_pipeline(files, opts)
            return kept_corpus(ds) if args.kept_only else ds

    if not os.path.isdir(args.input):
        sys.exit(f"error: --input {args.input!r} is not a directory")
    shards = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.endswith(".parquet")
    )
    if not shards:
        sys.exit(f"error: no .parquet shards found under {args.input!r}")
    results = resumable_run(shards, args.output, pipeline, group_size=args.group_size)
    summary = {
        "groups": len(results),
        "skipped": sum(1 for r in results if r.skipped),
        "rows_in": sum(r.rows_in for r in results),
        "rows_out": sum(r.rows_out for r in results),
        "wall_sec": round(sum(r.wall_sec for r in results), 3),
    }
    # Roll the checkpointed per-partition stage metrics (<output>/_metrics
    # Parquet) into the summary line — covers ALL completed groups, including
    # ones finished by earlier (resumed) invocations.
    from pii_detection_test_ray.state.lineage import read_stage_metrics

    m = read_stage_metrics(args.output)
    totals: dict[str, float] = {}
    for metric, value in zip(
        m.column("metric").to_pylist(), m.column("value").to_pylist()
    ):
        if not metric.startswith(("lang:", "drop_reason:")) and metric != "wall_sec":
            totals[metric] = totals.get(metric, 0.0) + value
    # rows_in/rows_out come from the same rollup so every count in the line
    # shares one scope (all completed groups, across resumed invocations) —
    # previously they were this-invocation sums, so kept+dropped could
    # exceed rows_out after a resume.
    for name in ("rows_in", "rows_out", "kept", "dropped", "pii_spans", "toxic_spans"):
        if name in totals:
            summary[name] = int(totals[name])
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
