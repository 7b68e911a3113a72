#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Usage (cluster):
    python tools/package_pyfiles.py          # -> dist/src_to_kb_spark.zip
    spark-submit --py-files dist/src_to_kb_spark.zip \
        jobs/run_kg_pipeline.py --input /data/pages --output /data/kb

Usage (local smoke):
    spark-submit jobs/run_kg_pipeline.py \
        --input /root/testdata/sf0.001 --output /tmp/kb_out

Each stage writes its own parquet table under --output with a
``_committed_<stage>`` marker and per-partition lineage metrics
(``_metrics_<stage>.json``).  Re-running with the same --output resumes:
committed stages are re-read, uncommitted input keys are recomputed via
anti-join (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").  Resume cost is O(delta), not O(corpus): per-doc
stages (documents, chunks, linked, bands) append rows derived from the
new docs only, near-dup pairs come from joining the delta's bands
against the committed bands table, and only the genuinely global
stages — components (over the small pair table) and triples (map-only
union) — recompute.  ``--table-format iceberg`` routes the same stage
I/O through Iceberg tables (``runtime/checkpoint.py``
:class:`IcebergFormat`): writes become catalog snapshots and each
``_committed_<stage>`` marker records the committed snapshot id — the
resume contract is identical, the markers just point into the catalog.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages table dir (or driver testdata sf dir)")
    ap.add_argument("--output", required=True, help="KB output dir")
    ap.add_argument("--chunk-size", type=int, default=1000)
    ap.add_argument("--overlap", type=int, default=200)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--table-format", choices=("parquet", "iceberg"),
                    default="parquet",
                    help="physical stage-table layer: bare parquet dirs "
                         "under --output (default), or Iceberg tables "
                         "<--table-prefix>.<stage> in a configured Spark "
                         "catalog (markers then record snapshot ids)")
    ap.add_argument("--table-prefix", default="kb.main",
                    help="iceberg only: catalog.namespace holding the "
                         "stage tables")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from src_to_kb_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )
    from src_to_kb_spark.operators.chunker import chunk_documents
    from src_to_kb_spark.operators.dedup import (
        band_signature_rows,
        candidate_pairs_from_bands,
        candidate_pairs_involving,
        verify_candidate_pairs,
    )
    from src_to_kb_spark.operators.extract import (
        MAX_FILE_SIZE,
        extract_pages,
    )
    from src_to_kb_spark.operators.linking import link_mentions
    from src_to_kb_spark.operators.mentions import detect_mentions
    from src_to_kb_spark.operators.triples import (
        build_triples,
        chunk_triples,
        doc_triples,
        mention_triples,
        same_as_triples,
    )
    from src_to_kb_spark.runtime.checkpoint import (
        IcebergFormat,
        ParquetFormat,
        is_committed,
        read_stage,
        resume_delta,
        run_metrics,
        write_stage,
    )
    from src_to_kb_spark.runtime.skew import salted_repartition
    from src_to_kb_spark.session import get_spark
    from src_to_kb_spark.sources.gazetteer import gazetteer_df
    from src_to_kb_spark.sources.pages import load_pages

    # Under spark-submit a session already exists; reuse its conf.
    active = SparkSession.getActiveSession()
    spark = active if active is not None else get_spark(
        "kg-pipeline", cpus=args.cpus
    )
    os.makedirs(args.output, exist_ok=True)
    # Physical table layer: --output always holds the control plane
    # (markers/metrics/params sidecars); the stage DATA lives either in
    # parquet dirs under it (default) or in Iceberg tables, where every
    # commit marker records the committed snapshot id (north_star:
    # "resumes from the last committed Iceberg snapshot checkpoint").
    fmt = (
        IcebergFormat(spark, args.table_prefix)
        if args.table_format == "iceberg" else ParquetFormat(args.output)
    )

    # Untrusted-input precondition: every downstream triple part is
    # (subj, pred, obj)-unique ONLY for unique urls (operators/
    # triples.py build_triples docstring) — a crawl revisiting a page
    # would otherwise emit duplicate triples.  Enforce it once at
    # ingest (doc-granular shuffle, far cheaper than a distinct over
    # the full edge table).  The survivor is picked DETERMINISTICALLY
    # — latest warc_ts, content-checksum tiebreak — via max_by (one
    # shuffle WITH map-side partial aggregation; a row_number window
    # would sort whole url-partitions for the same answer).  A bare
    # dropDuplicates keeps an arbitrary row, making KB output
    # nondeterministic across runs when a url recurs with different
    # content.
    # Apply the extract size gate HERE, before dedup and before the
    # resume anti-join: a gated page never reaches the documents table,
    # so leaving it in `pages` would make it a PERMANENT phantom delta
    # — every no-op resume would re-detect it as new, invalidate the
    # downstream stages and recompute them, turning O(delta) resume
    # into O(corpus) forever.
    # keep_keys=False: the pipeline only consumes the 5 north-rule
    # columns, and a REAL pages table has no synthesized keys anyway
    # (load_pages raises on keep_keys=True there)
    raw_pages = load_pages(spark, args.input, keep_keys=False).filter(
        F.length("html") <= MAX_FILE_SIZE
    )
    page_cols = raw_pages.columns
    pages = (
        raw_pages.groupBy("url")
        .agg(
            F.max_by(
                F.struct(*[c for c in page_cols if c != "url"]),
                F.struct(
                    F.col("warc_ts"),
                    F.sha2(F.col("html"), 256),
                    F.sha2(F.col("text"), 256),
                ),
            ).alias("_p")
        )
        .select("url", "_p.*")
        .select(*page_cols)
    )

    DOWNSTREAM = ("chunks", "linked", "bands", "neardup_pairs",
                  "components", "triples")
    pending_marker = os.path.join(args.output, "_delta_pending")

    def invalidate(stages):
        for st in stages:
            marker = os.path.join(args.output, f"_committed_{st}")
            if os.path.exists(marker):
                os.remove(marker)

    # Crash recovery: a `_delta_pending` marker means a previous run
    # died between appending a documents delta and reconciling the
    # downstream stages — some of their `_committed` markers may be
    # stale (missing the delta's rows) with no way to tell which.
    # Invalidate them ALL; they rebuild from the (complete) documents
    # table.  The marker is removed only after every downstream stage
    # has been reconciled, so the window is correct at any crash point.
    if os.path.exists(pending_marker):
        invalidate(DOWNSTREAM)
        os.remove(pending_marker)

    # Stage PARAMETERS are part of the resume identity, exactly like
    # the band scheme below: a committed chunks table built with
    # --chunk-size 1000 is NOT the answer to a --chunk-size 500 run,
    # and a 0.8-threshold pair table silently masquerading as the 0.6
    # result would drop every 0.6 ≤ j < 0.8 pair from components and
    # same_as triples.  Record the params; on mismatch invalidate the
    # stages derived from the changed ones (documents is
    # parameter-independent and always survives).
    params = {
        "chunk_size": args.chunk_size,
        "overlap": args.overlap,
        "neardup_threshold": args.neardup_threshold,
        # The PHYSICAL table layer is part of the identity too: a
        # _committed_documents marker written by a parquet run says
        # nothing about the state of Iceberg tables under
        # --table-prefix (and vice versa) — trusting it would resume
        # against a different table layer's contents or crash with
        # TABLE_OR_VIEW_NOT_FOUND deep inside resume_delta.
        "table_format": args.table_format,
        "table_prefix": args.table_prefix,
    }
    params_path = os.path.join(args.output, "_scheme_params")
    prev_params = {}
    if os.path.exists(params_path):
        with open(params_path) as f:
            prev_params = json.load(f)
    if prev_params and prev_params != params:
        stale = set()
        # Pre-format-era params files lack the format keys; the KB's
        # actual layer is still knowable from marker CONTENT (Iceberg
        # markers carry 'snapshot=<id>', parquet markers a timestamp) —
        # inferring it avoids both spuriously rebuilding a legacy
        # iceberg KB resumed with matching args and silently trusting
        # its markers under a parquet rerun.  A legacy iceberg sidecar
        # stored no prefix, so the caller's is assumed (resume-with-
        # same-args, the only recoverable case).  The prefix otherwise
        # participates only under iceberg (parquet ignores it).
        def _layer(p):
            f = p.get("table_format")
            if f is None:
                try:
                    with open(
                        os.path.join(args.output, "_committed_documents")
                    ) as fh:
                        f = (
                            "iceberg"
                            if fh.read().startswith("snapshot=")
                            else "parquet"
                        )
                except OSError:
                    f = "parquet"
            prefix = p.get("table_prefix", args.table_prefix)
            return (f, prefix if f == "iceberg" else None)

        if _layer(prev_params) != _layer(params):
            stale |= {"documents", *DOWNSTREAM}
        if (prev_params.get("chunk_size"), prev_params.get("overlap")) != (
            params["chunk_size"], params["overlap"]
        ):
            stale |= {"chunks", "triples"}
        if prev_params.get("neardup_threshold") != params[
            "neardup_threshold"
        ]:
            stale |= {"neardup_pairs", "components", "triples"}
        invalidate(sorted(stale))
    os.makedirs(args.output, exist_ok=True)
    with open(params_path, "w") as f:
        json.dump(params, f)

    # -- stage: documents (resume unit = url) ------------------------------
    docs_delta = None  # extracted rows appended this run, if resuming
    if is_committed(args.output, "documents"):
        delta = resume_delta(pages, spark, args.output, "documents", fmt=fmt)
        if delta.limit(1).count() > 0:
            docs_new = extract_pages(
                salted_repartition(
                    delta, n_partitions=spark.sparkContext.defaultParallelism
                )
            ).localCheckpoint()
            # pending marker BEFORE the append: from here until all
            # downstream stages reconcile, a crash must invalidate them
            with open(pending_marker, "w") as f:
                f.write("reconciling documents delta")
            write_stage(docs_new, args.output, "documents", mode="append",
                        fmt=fmt)
            docs_delta = docs_new
    else:
        docs_all = extract_pages(
            salted_repartition(
                pages, n_partitions=spark.sparkContext.defaultParallelism
            )
        )
        write_stage(docs_all, args.output, "documents", fmt=fmt)
    documents = read_stage(spark, args.output, "documents", fmt=fmt)

    # -- resume semantics for downstream stages ----------------------------
    # A documents delta invalidates every committed downstream result.
    # Per-document (map-only) stages — chunks, linked — propagate the
    # delta exactly: compute over the NEW documents only, append.
    # Near-dup is delta-aware too (r2 verdict #2): the band signatures
    # are their own committed stage table, so a delta only bands the
    # NEW docs and joins them against the committed bands — the band
    # UDF never re-touches the existing corpus.  Components update
    # INCREMENTALLY from the committed labeling when one exists
    # (quotient-graph contraction — the iterative CC work is O(delta);
    # see incremental_components); only triples (map-only union over
    # stage tables) recompute outright.
    # Seed eligibility is decided BEFORE invalidation: the marker comes
    # off below, but the parquet labels stay on disk and are exactly
    # the pre-delta fixpoint — a crash mid-delta re-enters through the
    # _delta_pending invalidation above, which also clears the seed.
    components_seed_ok = docs_delta is not None and is_committed(
        args.output, "components"
    )
    if docs_delta is not None:
        invalidate(("components", "triples"))

    # -- downstream stages (each committed-or-computed) --------------------
    gaz = gazetteer_df(spark)

    def stage(name, make, partition_by=None, make_delta=None):
        if not is_committed(args.output, name):
            write_stage(make(), args.output, name,
                        partition_by=partition_by, fmt=fmt)
        elif docs_delta is not None and make_delta is not None:
            # per-document stage: exact delta propagation (append rows
            # derived from the new documents only)
            write_stage(
                make_delta(docs_delta), args.output, name, mode="append",
                partition_by=partition_by, fmt=fmt,
            )
        return read_stage(spark, args.output, name, fmt=fmt)

    # chunks, mention-linking, and near-dup→components are independent
    # given the committed documents table — submit their stage writes
    # as concurrent Spark jobs (on a cluster: three parallel writers;
    # serializing them idles executors at every stage barrier)
    from concurrent.futures import ThreadPoolExecutor

    def mk_chunks():
        return stage(
            "chunks",
            lambda: chunk_documents(documents, args.chunk_size, args.overlap),
            make_delta=lambda d: chunk_documents(
                d, args.chunk_size, args.overlap
            ),
        )

    def mk_linked():
        return stage(
            "linked",
            lambda: link_mentions(detect_mentions(documents, gaz), gaz),
            make_delta=lambda d: link_mentions(detect_mentions(d, gaz), gaz),
        )

    def mk_components():
        from src_to_kb_spark.operators.dedup import BANDS_SCHEME

        # Committed bands are only delta-joinable against bands of the
        # SAME signature scheme: a KB written by an older scheme would
        # otherwise band-join with zero collisions and silently miss
        # every cross-version near-dup pair.  Compare the recorded tag
        # and rebuild the near-dup family on mismatch.
        scheme_path = os.path.join(args.output, "_scheme_bands")
        prev_scheme = None
        if os.path.exists(scheme_path):
            with open(scheme_path) as f:
                prev_scheme = f.read().strip()
        if is_committed(args.output, "bands") and prev_scheme != BANDS_SCHEME:
            invalidate(("bands", "neardup_pairs", "components", "triples"))

        # bands stage table: 2 short strings per doc — per-document, so
        # it delta-appends like chunks/linked
        bands = stage(
            "bands",
            lambda: band_signature_rows(documents),
            make_delta=band_signature_rows,
        )
        with open(scheme_path, "w") as f:
            f.write(BANDS_SCHEME)
        delta_pairs = None
        if not is_committed(args.output, "neardup_pairs"):
            write_stage(
                verify_candidate_pairs(
                    documents,
                    candidate_pairs_from_bands(bands),
                    threshold=args.neardup_threshold,
                ),
                args.output,
                "neardup_pairs",
                fmt=fmt,
            )
        elif docs_delta is not None:
            # incremental near-dup: every NEW pair has ≥1 delta member
            # (delta urls are anti-joined fresh), so candidates =
            # bands(delta) ⋈ bands(full, incl. the just-appended delta
            # rows), verified against the full documents table, and
            # APPENDED — the committed pair set stays untouched.
            # localCheckpoint: the incremental-components path below
            # re-reads these rows; without it the verify join would
            # re-run per consumer.
            delta_keys = docs_delta.select(F.col("url").alias("key"))
            delta_bands = bands.join(delta_keys, "key", "left_semi")
            delta_pairs = verify_candidate_pairs(
                documents,
                candidate_pairs_involving(delta_bands, bands),
                threshold=args.neardup_threshold,
            ).localCheckpoint()
            write_stage(
                delta_pairs, args.output, "neardup_pairs", mode="append",
                fmt=fmt,
            )
        pairs = read_stage(spark, args.output, "neardup_pairs", fmt=fmt)
        if (
            not is_committed(args.output, "components")
            and components_seed_ok
            and delta_pairs is not None
        ):
            # incremental CC: seed from the committed labeling, contract
            # the delta pairs, iterate over O(delta) edges only.  The
            # eager checkpoint materializes the result BEFORE the
            # overwrite of the table it was read from.
            seed = read_stage(spark, args.output, "components", fmt=fmt)
            updated = incremental_components(
                seed, delta_pairs
            ).localCheckpoint()
            write_stage(updated, args.output, "components", fmt=fmt)
        return pairs, stage(
            "components", lambda: connected_components(pairs)
        )

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_chunks = ex.submit(mk_chunks)
        f_linked = ex.submit(mk_linked)
        f_comp = ex.submit(mk_components)
        chunks = f_chunks.result()
        linked = f_linked.result()
        pairs, components = f_comp.result()
    # partitioned by predicate: a query touching one predicate
    # (e.g. all same_as edges) scans one directory, not the table
    triples = stage(
        "triples",
        lambda: build_triples(
            doc_triples(documents),
            mention_triples(linked),
            same_as_triples(components),
            chunk_triples(chunks),
        ),
        partition_by=["pred"],
    )
    # every downstream stage is now consistent with the appended delta
    if os.path.exists(pending_marker):
        os.remove(pending_marker)

    summary = {
        "documents": documents.count(),
        "chunks": chunks.count(),
        "linked": linked.count(),
        "neardup_pairs": pairs.count(),
        "components": components.count(),
        "triples": triples.count(),
        "stages": run_metrics(args.output),
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "stages"}))
    return summary


if __name__ == "__main__":
    main()
