#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), and
reports per-query wall seconds plus the pipeline's triples/sec.

Scaling evidence (north_rule, sandbox proxy): ``--scaling`` runs the
full KG pipeline at two parallelism levels (local[8] vs local[32]) on
the same input and reports throughput at both and the N→4N efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "doc_ingest",
    "chunks",
    "search_docs",
    "search_chunks",
    "mentions",
    "entity_link",
    "neardup_minhash",
    "knn_cosine",
    "text_stats",
    "pipeline_triples",
]


def _run_once(spark, sf_dir: str) -> tuple[dict[str, float], int]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_triples = 0
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        if name == "pipeline_triples":
            n_triples = n
    return timings, n_triples


def main() -> None:
    from src_to_kb_spark.session import get_spark

    scaling = "--scaling" in sys.argv or "--scaling-only" in sys.argv
    sweep = "--scaling-only" not in sys.argv

    result = {
        "metric": "kg_pipeline_triples_per_sec",
        "unit": "sec",
        "sf": SF_DIR,
        "cpus": CPUS,
    }
    if sweep:
        spark = get_spark("bench", cpus=CPUS, shuffle_partitions=max(CPUS, 8))
        t_all = time.time()
        timings, n_triples = _run_once(spark, SF_DIR)
        total = round(time.time() - t_all, 3)
        pipeline_sec = timings.get("pipeline_triples", total)
        spark.stop()
        result.update(
            value=total,
            queries=timings,
            n_triples=n_triples,
            triples_per_sec=(
                round(n_triples / pipeline_sec, 1) if pipeline_sec else 0.0
            ),
        )

    if scaling:
        # Scaling evidence (north_rule, sandbox proxy): the SAME input
        # at two parallelism levels.  The input is replicated
        # deterministically (unique urls per copy) so the job is
        # compute-bound rather than fixed-overhead-bound at local test
        # scale — throughput must then track cores.
        # 64× replication (~320k docs at sf0.1) makes the job compute-
        # dominated; below that, fixed per-job overhead (barriers,
        # Python-worker spin-up) swamps the core-count signal.
        replicate = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "64"))
        scale_results = {}
        for cpus in (8, 32):
            s = get_spark(f"bench-scale-{cpus}", cpus=cpus,
                          shuffle_partitions=max(cpus, 8))
            from pyspark.sql import functions as F

            from src_to_kb_spark.pipeline import run_pipeline
            from src_to_kb_spark.sources.pages import load_pages

            pages = load_pages(s, SF_DIR)
            copies = F.explode(
                F.array(*[F.lit(i) for i in range(replicate)])
            ).alias("copy")
            pages_scaled = pages.select("*", copies).withColumn(
                "url", F.concat_ws("?r=", F.col("url"), F.col("copy"))
            ).drop("copy")
            t0 = time.time()
            n = run_pipeline(s, pages_scaled, neardup_threshold=0.6).triples.count()
            dt = time.time() - t0
            scale_results[f"local[{cpus}]"] = {
                "sec": round(dt, 3),
                "triples_per_sec": round(n / dt, 1),
                "replicate": replicate,
            }
            s.stop()
        tp8 = scale_results["local[8]"]["triples_per_sec"]
        tp32 = scale_results["local[32]"]["triples_per_sec"]
        result["scaling"] = {
            **scale_results,
            "efficiency_n_to_4n": round(tp32 / (4 * tp8), 3) if tp8 else None,
        }
        result.setdefault(
            "value", scale_results["local[32]"]["sec"]
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
