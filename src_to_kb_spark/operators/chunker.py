"""Chunk stage: ``documents`` → ``chunks`` (SURVEY.md §2.4 C1).

The reference's sliding-window line-packing chunker
(kb-generator.js:363-417) is stateful over lines and not expressible
in native SQL, so it is the one genuinely UDF-shaped operator in the
ingest path.  It runs as a vectorized ``pandas_udf`` returning
``array<struct>`` per document, followed by ``posexplode`` — i.e. the
classic Spark UDTF pattern: 1 row in, N struct rows out, all Arrow
batched, no per-row Python round-trips.

Map-only, shuffle-free; chunk ids are derived deterministically from
the parent ``doc_uid`` (P7, kb-generator.js:381) so the stage is
idempotent and resume-safe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..core.textproc import create_chunks

CHUNK_SCHEMA = (
    "array<struct<index:int,content:string,start_line:int,end_line:int,size:int>>"
)


def _make_chunk_udf(chunk_size: int, overlap: int):
    @pandas_udf(CHUNK_SCHEMA)
    def chunk_udf(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: [
                (c["index"], c["content"], c["start_line"], c["end_line"], c["size"])
                for c in create_chunks(t or "", chunk_size, overlap)
            ]
        )

    return chunk_udf


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 1000,
    overlap: int = 200,
    id_col: str = "doc_uid",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = ("url", "lang"),
) -> DataFrame:
    """documents → chunks(doc_uid, chunk_id, chunk_index, content,
    start_line, end_line, size, +carry_cols).

    Defaults 1000/200 per kb-generator.js:17-18.
    """
    chunk_udf = _make_chunk_udf(chunk_size, overlap)
    exploded = docs.select(
        F.col(id_col).alias("doc_uid"),
        *[F.col(c) for c in carry_cols],
        F.explode(chunk_udf(F.col(text_col))).alias("ch"),
    )
    return exploded.select(
        "doc_uid",
        *carry_cols,
        # P7 — `${documentId}_chunk_${index}` (kb-generator.js:381)
        F.concat(
            F.col("doc_uid"), F.lit("_chunk_"), F.col("ch.index").cast("string")
        ).alias("chunk_id"),
        F.col("ch.index").alias("chunk_index"),
        F.col("ch.content").alias("content"),
        F.col("ch.start_line").alias("start_line"),
        F.col("ch.end_line").alias("end_line"),
        F.col("ch.size").alias("size"),
    )
