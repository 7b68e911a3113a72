"""End-to-end KG-construction pipeline composition (SURVEY.md §7.2).

pages → extract → chunk → mentions → link → near-dup canonicalize →
triples.  Each stage is a pure DataFrame→DataFrame function; this
module only composes them and (optionally) persists each stage's
output — the resume unit at scale (every stage writes its own
partitioned table; restart anti-joins committed keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.canonicalize import connected_components
from .operators.chunker import chunk_documents
from .operators.dedup import neardup_pairs
from .operators.extract import extract_pages
from .operators.linking import link_mentions
from .operators.mentions import detect_mentions
from .operators.triples import (
    build_triples,
    chunk_triples,
    doc_triples,
    mention_triples,
    same_as_triples,
)
from .sources.gazetteer import gazetteer_df
from .sources.pages import load_pages


@dataclass
class PipelineResult:
    documents: DataFrame
    chunks: DataFrame
    mentions: DataFrame
    linked: DataFrame
    components: DataFrame
    triples: DataFrame
    metrics: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    chunk_size: int = 1000,
    overlap: int = 200,
    neardup_threshold: float = 0.8,
    include_chunk_triples: bool = True,
    repartition_input: bool = True,
) -> PipelineResult:
    gaz = gazetteer_df(spark)

    if repartition_input:
        # Salted repartition on (url_host, xxhash64(url) % salt): spreads
        # hot hosts AND guarantees the map stages actually fan out — a
        # small parquet input may arrive as one partition, which would
        # serialize the Arrow UDF stages regardless of cluster size.
        # 1× parallelism: chained Arrow stages pay a fixed per-task
        # setup cost, so over-partitioning is expensive (4× cores
        # measured 3× slower end-to-end at small inputs); on heavily
        # skewed REAL inputs where per-task runtimes vary, raise the
        # multiplier for packing slack — AQE still splits stragglers.
        from .runtime.skew import salted_repartition

        pages = salted_repartition(
            pages, n_partitions=spark.sparkContext.defaultParallelism
        )

    # The extract stage feeds four independent consumers (chunker,
    # mentions, near-dup, doc triples) — persist it once instead of
    # re-running the UDF scan per branch.  At cluster scale the same
    # role is played by the stage's committed table.
    documents = extract_pages(pages).persist()
    chunks = chunk_documents(documents, chunk_size, overlap)
    mentions = detect_mentions(documents, gaz)
    linked = link_mentions(mentions, gaz)
    pairs = neardup_pairs(documents, threshold=neardup_threshold)
    # No nodes df: singletons never produce same_as edges, so label
    # propagation only needs the nodes that appear in pairs.
    components = connected_components(pairs)

    parts = [doc_triples(documents), mention_triples(linked),
             same_as_triples(components)]
    if include_chunk_triples:
        parts.append(chunk_triples(chunks))
    triples = build_triples(*parts)

    return PipelineResult(
        documents=documents,
        chunks=chunks,
        mentions=mentions,
        linked=linked,
        components=components,
        triples=triples,
    )


def run_pipeline_sf(spark: SparkSession, sf_dir: str, **kw) -> PipelineResult:
    # keep_keys=False: the pipeline consumes only the 5 north-rule
    # columns (extract_pages re-derives ids from url), and a REAL pages
    # table has no synthesized keys — load_pages raises on keep_keys=True
    # there, so the default would reject exactly the input shape this
    # entry point supports.
    return run_pipeline(spark, load_pages(spark, sf_dir, keep_keys=False), **kw)
