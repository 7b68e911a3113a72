"""KB table round-trip operators: summary sink, content reconstruction,
upload completeness verification, single-text processing
(SURVEY.md §2.1 S10/S14/S15/S16 and §3.3).

The reference triplicates KB loading across search/upload/mcp
(search.js:51-80, upload.js:44-97, mcp-server.mjs:36-61); here the
"catalog" is just `spark.read` of the stage tables, and the
upload-time join-and-verify (upload.js:146-158) becomes a real
anti-join — one of the few natural joins in the system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunker import chunk_documents
from ..operators.extract import extract_pages


def kb_summary_documents(docs: DataFrame, chunks: DataFrame) -> DataFrame:
    """The per-document projection of summary.json as a DataFrame —
    (id, path, size, chunks, language, type) — so the summary scales:
    at 10^9 docs this is a table write, never a driver list."""
    counts = chunks.groupBy("doc_uid").agg(F.count("*").alias("chunks"))
    return (
        docs.select("doc_uid", "url", "size", "language_ext", "type")
        .join(counts, "doc_uid", "left")
        .select(
            F.col("doc_uid").alias("id"),
            F.col("url").alias("path"),
            "size",
            F.coalesce("chunks", F.lit(0)).alias("chunks"),
            F.col("language_ext").alias("language"),
            F.col("type").alias("type"),
        )
    )


def kb_summary(
    docs: DataFrame,
    chunks: DataFrame,
    config: dict | None = None,
    out_dir: str | None = None,
    collect_documents: bool = False,
) -> dict:
    """S10 — metadata/summary.json shape (kb-generator.js:487-509):
    run stats + per-document projection.  ``generatedAt`` is omitted by
    design: determinism (SURVEY.md §7.4 hard-part 3).

    The dict carries ONLY scalars by default — the per-document list
    that the reference inlines into summary.json is a driver-side
    bottleneck at scale, so it is written as a stage table when
    ``out_dir`` is given (``summary_documents``) and inlined only on
    explicit test-scale opt-in (``collect_documents=True``)."""
    totals = docs.agg(
        F.count("*").alias("files"), F.sum("size").alias("bytes")
    ).first()
    n_chunks = chunks.count()
    summary: dict = {
        "stats": {
            "filesProcessed": totals["files"],
            "totalSize": int(totals["bytes"] or 0),
            "totalChunks": int(n_chunks),
            "errors": [],
        },
        "config": config or {"chunkSize": 1000, "chunkOverlap": 200},
    }
    per_doc = kb_summary_documents(docs, chunks)
    if out_dir is not None:
        from ..runtime.checkpoint import write_stage

        write_stage(per_doc, out_dir, "summary_documents")
        summary["documents_table"] = f"{out_dir}/summary_documents"
    if collect_documents:
        summary["documents"] = [
            dict(r) for r in per_doc.toPandas().to_dict("records")
        ]
    return summary


def reconstruct_content(chunks: DataFrame) -> DataFrame:
    """S15 — rebuild document content as chunk contents joined with
    '\\n\\n' in index order (upload.js:187-190).  Lossy vs the original
    (overlap regions duplicated), exactly like the reference."""
    return chunks.groupBy("doc_uid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_index", "content"))
                ),
                lambda s: s["content"],
            ),
            "\n\n",
        ).alias("content")
    )


def verify_upload_completeness(
    chunks: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """Upload-time completeness check (upload.js:146-158): documents
    whose chunks lack embeddings → (doc_uid, n_chunks, n_missing).
    Incomplete docs are skipped-with-warning by the reference; we
    return them for the caller to decide."""
    joined = chunks.join(
        embeddings.select("chunk_id", F.lit(1).alias("has_emb")),
        "chunk_id",
        "left",
    )
    return (
        joined.groupBy("doc_uid")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("has_emb").isNull(), 1).otherwise(0)).alias(
                "n_missing"
            ),
        )
        .filter(F.col("n_missing") > 0)
    )


def process_single_text(
    spark: SparkSession,
    url: str,
    text: str,
    chunk_size: int = 1000,
    overlap: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """S16 — the POST /api/v1/process-file path (api-server.js:613-655):
    a single payload through the same clean+chunk stages, as a 1-row
    DataFrame through the identical code path."""
    pages = spark.createDataFrame(
        [(url, text.encode("utf-8"), text, "unknown")],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.lit(None).cast("timestamp"))
    docs = extract_pages(pages)
    return docs, chunk_documents(docs, chunk_size, overlap)
