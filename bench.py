#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), and
reports per-query wall seconds plus the pipeline's triples/sec.

Scaling evidence (north_rule, sandbox proxy): ``--scaling`` runs the
full KG pipeline on the same deterministic generated corpus at two
REAL executor-JVM cluster sizes (``local-cluster[1,8,16g]`` vs
``local-cluster[4,8,16g]``, package shipped via the --py-files zip)
and reports full-pipeline and map-core throughput at both plus the
N→4N efficiencies.  See BASELINE.md "Measured results" for the
recorded numbers and the single-box-proxy caveats.
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
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink, NOT count(): Catalyst prunes deterministic UDF /
        # projection work under a count aggregate, which under-measured
        # queries whose cost lives in unprojected columns (r1 verdict)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    # row count for the throughput denominator only — untimed
    n_triples = qs["pipeline_triples"](spark, sf_dir).count()
    return timings, n_triples


def _scale_worker(cpus: int, n_docs: int) -> None:
    """Subprocess entry: run the full pipeline over the deterministic
    generated corpus on a local-cluster of cpus//8 REAL executor JVMs
    (8 cores each) and print one JSON line.

    Reports two timings: the full pipeline, and the map-side document-
    processing core (extract + LSH band signatures) that dominates a
    10^12-doc run — at sandbox input sizes the pipeline's fixed
    per-job/barrier latency (~2 min regardless of parallelism) masks
    executor scaling, while the map core scales with executors.
    """
    from src_to_kb_spark.operators.canonicalize import connected_components
    from src_to_kb_spark.operators.chunker import chunk_documents
    from src_to_kb_spark.operators.dedup import (
        make_bands_udf,
        neardup_pairs,
    )
    from src_to_kb_spark.operators.extract import extract_pages
    from src_to_kb_spark.operators.linking import link_mentions
    from src_to_kb_spark.operators.mentions import detect_mentions
    from src_to_kb_spark.operators.triples import (
        build_triples,
        chunk_triples,
        doc_triples,
        mention_triples,
        same_as_triples,
    )
    from src_to_kb_spark.session import get_spark
    from src_to_kb_spark.sources.gazetteer import gazetteer_df
    from src_to_kb_spark.sources.pages import synthetic_pages_distributed

    from pyspark.sql import functions as F

    n_exec = max(1, cpus // 8)
    s = get_spark(
        f"bench-scale-{cpus}",
        cpus=cpus,
        master=f"local-cluster[{n_exec},8,16384]",
        extra_conf={"spark.executor.memory": "15g"},
    )
    # real executors need the package shipped — dogfood the
    # spark-submit --py-files artifact
    import subprocess as _sp

    zip_path = _sp.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tools", "package_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    s.sparkContext.addPyFile(zip_path)

    # generate directly into 4×cores balanced partitions — the
    # generator's output is uniform, so a salted reshuffle of the raw
    # corpus would be pure overhead (on a real deployment the input is
    # a well-partitioned Iceberg table; salting belongs where skew
    # exists, e.g. a raw crawl keyed by host)
    pages = synthetic_pages_distributed(s, n_docs, n_partitions=4 * cpus)
    t0 = time.time()

    # ---- map-side document-processing core (scales with executors) --
    docs = extract_pages(pages).persist()
    docs.count()
    bands_udf = make_bands_udf()
    docs.select(
        F.col("url").alias("key"), bands_udf(F.col("text")).alias("bands")
    ).write.format("noop").mode("overwrite").save()
    t_core = time.time() - t0

    # ---- the rest of the pipeline ----------------------------------
    gaz = gazetteer_df(s)
    chunks = chunk_documents(docs).persist()
    chunks.count()
    linked = link_mentions(detect_mentions(docs, gaz), gaz).persist()
    linked.count()
    pairs = neardup_pairs(docs, threshold=0.6).persist()
    pairs.count()
    comp = connected_components(pairs).persist()
    comp.count()
    n = build_triples(
        doc_triples(docs), mention_triples(linked),
        same_as_triples(comp), chunk_triples(chunks),
    ).count()
    dt = time.time() - t0
    print(json.dumps({
        "sec": round(dt, 3),
        "triples_per_sec": round(n / dt, 1),
        "map_core_sec": round(t_core, 3),
        "map_core_docs_per_sec": round(n_docs / t_core, 1),
        "n_docs": n_docs,
        "n_triples": n,
        "n_executors": n_exec,
    }))
    s.stop()


def main() -> None:
    from src_to_kb_spark.session import get_spark

    if "--scale-worker" in sys.argv:
        i = sys.argv.index("--scale-worker")
        _scale_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return

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
        timings, n_triples = _run_once(spark, SF_DIR)
        # value = the measured sweep (sum of per-query noop-sink
        # timings); the untimed denominator count pass is excluded
        total = round(sum(timings.values()), 3)
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
        # at two parallelism levels.  The input is a deterministic
        # distributed generator (content a function of doc id only, so
        # both levels see the identical corpus) with a LINEAR planted
        # near-dup rate — replicating the sf corpus instead creates
        # k-cliques of identical docs, i.e. a quadratic candidate-pair
        # structure no real n-times-larger crawl has.  ~320k docs makes
        # the job compute-dominated; below that, fixed per-job overhead
        # (barriers, Python-worker spin-up) swamps the core-count
        # signal.
        # Each level runs in its OWN subprocess: stopping a local-mode
        # session and creating another in the same JVM leaves residual
        # state that intermittently stalls the second run by tens of
        # seconds — a fresh JVM per level is stable (and is also what
        # two real cluster submissions would be).
        import subprocess

        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "320000"))
        scale_results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scale-worker", str(cpus), str(n_docs)],
                capture_output=True, text=True, check=True,
            )
            scale_results[f"local[{cpus}]"] = json.loads(
                out.stdout.strip().splitlines()[-1]
            )
        tp8 = scale_results["local[8]"]["triples_per_sec"]
        tp32 = scale_results["local[32]"]["triples_per_sec"]
        mc8 = scale_results["local[8]"]["map_core_docs_per_sec"]
        mc32 = scale_results["local[32]"]["map_core_docs_per_sec"]
        result["scaling"] = {
            **scale_results,
            "efficiency_n_to_4n": round(tp32 / (4 * tp8), 3) if tp8 else None,
            # the map-side document-processing core is what dominates a
            # 10^12-doc run; its efficiency is the cluster-scaling
            # signal once the sandbox's fixed per-job latency amortizes
            "map_core_efficiency_n_to_4n": (
                round(mc32 / (4 * mc8), 3) if mc8 else None
            ),
        }
        result.setdefault(
            "value", scale_results["local[32]"]["sec"]
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
