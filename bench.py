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


def _scale_worker(cpus: int, n_docs: int) -> None:
    """Subprocess entry: run the full pipeline over the deterministic
    generated corpus at one parallelism level, print one JSON line.

    Stage materializations for chunks, mentions→link, and
    near-dup→components are INDEPENDENT given the persisted documents
    table, so they are submitted as concurrent Spark jobs (threads) —
    on a cluster these are three parallel stage writes; serializing
    them leaves executors idle at every stage barrier.
    """
    from concurrent.futures import ThreadPoolExecutor

    from src_to_kb_spark.operators.canonicalize import connected_components
    from src_to_kb_spark.operators.chunker import chunk_documents
    from src_to_kb_spark.operators.dedup import neardup_pairs
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
    from src_to_kb_spark.runtime.skew import salted_repartition
    from src_to_kb_spark.session import get_spark
    from src_to_kb_spark.sources.gazetteer import gazetteer_df
    from src_to_kb_spark.sources.pages import synthetic_pages_distributed

    s = get_spark(f"bench-scale-{cpus}", cpus=cpus)
    pages = synthetic_pages_distributed(s, n_docs)
    t0 = time.time()
    docs = extract_pages(
        salted_repartition(pages, n_partitions=4 * cpus)
    ).persist()
    docs.count()
    gaz = gazetteer_df(s)

    def mk_chunks():
        c = chunk_documents(docs).persist()
        c.count()
        return c

    def mk_linked():
        ln = link_mentions(detect_mentions(docs, gaz), gaz).persist()
        ln.count()
        return ln

    def mk_comp():
        p = neardup_pairs(docs, threshold=0.6).persist()
        p.count()
        cp = connected_components(p).persist()
        cp.count()
        return cp

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_chunks = ex.submit(mk_chunks)
        f_linked = ex.submit(mk_linked)
        f_comp = ex.submit(mk_comp)
        chunks, linked, comp = (
            f_chunks.result(), f_linked.result(), f_comp.result()
        )

    n = build_triples(
        doc_triples(docs), mention_triples(linked),
        same_as_triples(comp), chunk_triples(chunks),
    ).count()
    dt = time.time() - t0
    print(json.dumps({
        "sec": round(dt, 3),
        "triples_per_sec": round(n / dt, 1),
        "n_docs": n_docs,
        "n_triples": n,
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
