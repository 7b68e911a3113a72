"""Resume/checkpoint + streaming ingest tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from src_to_kb_spark.operators.chunker import chunk_documents
from src_to_kb_spark.operators.extract import extract_pages
from src_to_kb_spark.runtime.checkpoint import (
    is_committed,
    read_stage,
    resume_delta,
    run_metrics,
    write_stage,
)
from src_to_kb_spark.sources.pages import synthetic_pages
from src_to_kb_spark.streaming.ingest import run_ingest_once


def test_write_stage_metrics_and_resume(spark, tmp_path):
    out = str(tmp_path / "kb")
    os.makedirs(out, exist_ok=True)
    pages = synthetic_pages(spark, n=60)
    docs = extract_pages(pages)

    m = write_stage(docs, out, "documents")
    assert is_committed(out, "documents")
    assert m["n_rows"] == 60
    assert sum(p["n_rows"] for p in m["partitions"]) == 60
    assert all(p["n_rows"] > 0 for p in m["partitions"])

    # resume: committed keys are excluded from the delta
    delta = resume_delta(pages, spark, out, "documents", key="url")
    assert delta.count() == 0

    more = synthetic_pages(spark, n=80)  # 20 new urls beyond the first 60
    delta2 = resume_delta(more, spark, out, "documents", key="url")
    assert delta2.count() == 20

    assert [x["stage"] for x in run_metrics(out)] == ["documents"]
    assert read_stage(spark, out, "documents").count() == 60


def test_streaming_ingest_matches_batch(spark, tmp_path):
    pages = synthetic_pages(spark, n=50)
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(in_dir)

    run_ingest_once(spark, in_dir, out_dir, ck_dir)

    stream_docs = spark.read.parquet(f"{out_dir}/documents")
    batch_docs = extract_pages(spark.read.parquet(in_dir))
    assert stream_docs.count() == 50
    a = {(r["url"], r["checksum"]) for r in stream_docs.collect()}
    b = {(r["url"], r["checksum"]) for r in batch_docs.collect()}
    assert a == b

    stream_chunks = spark.read.parquet(f"{out_dir}/chunks")
    batch_chunks = chunk_documents(batch_docs)
    assert stream_chunks.count() == batch_chunks.count()
    sa = {(r["chunk_id"], r["content"]) for r in stream_chunks.collect()}
    sb = {(r["chunk_id"], r["content"]) for r in batch_chunks.collect()}
    assert sa == sb

    # idempotent restart: re-running with same checkpoint ingests nothing new
    run_ingest_once(spark, in_dir, out_dir, ck_dir)
    assert spark.read.parquet(f"{out_dir}/documents").count() == 50


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState exact-dedup: each distinct content is
    emitted once ACROSS micro-batch drains — the checkpointed state
    store carries seen-checksums over a restart."""
    from pyspark.sql import functions as F

    from src_to_kb_spark.streaming.dedup import run_dedup_once

    pages = synthetic_pages(spark, n=40)
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(in_dir)

    run_dedup_once(spark, in_dir, out_dir, ck_dir)
    uniq = spark.read.parquet(f"{out_dir}/unique_documents")
    n_distinct = extract_pages(pages).select("checksum").distinct().count()
    assert uniq.count() == n_distinct
    assert uniq.select("checksum").distinct().count() == n_distinct

    # second drain: re-crawl of the SAME pages under new urls plus 10
    # genuinely new pages -> only the new contents are emitted
    recrawl = pages.withColumn(
        "url", F.concat(F.lit("https://mirror.example.com/"), F.col("url"))
    )
    fresh = synthetic_pages(spark, n=50).where(
        ~F.col("url").isin([r["url"] for r in pages.select("url").collect()])
    )
    recrawl.union(fresh).write.mode("append").parquet(in_dir)

    run_dedup_once(spark, in_dir, out_dir, ck_dir)
    uniq2 = spark.read.parquet(f"{out_dir}/unique_documents")
    n_distinct_all = (
        extract_pages(pages).select("checksum")
        .union(extract_pages(fresh).select("checksum"))
        .distinct().count()
    )
    assert uniq2.select("checksum").distinct().count() == n_distinct_all
    assert uniq2.count() == n_distinct_all  # duplicates never re-emitted
