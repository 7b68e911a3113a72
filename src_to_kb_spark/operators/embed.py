"""Embedding stage: chunks → fixed-dim vectors (SURVEY.md §2.5 E1).

The reference calls OpenAI text-embedding-3-large once per document
with all its chunks batched, truncating each chunk to 8000 chars
(kb-generator.js:420-458, P8).  Per the build mandate (public
knowledge, deterministic, no network) we keep the exact *shape* —
chunk → fixed-dim float vector, batched per Arrow batch — and replace
the model with hashed n-gram feature embedding (feature hashing /
"hashing trick"), L2-normalized so cosine similarity is meaningful.

Vectorized: one pandas UDF, numpy per batch, no per-row Python at the
JVM boundary.  Deterministic: md5-seeded buckets and signs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64
MAX_EMBED_CHARS = 8000  # kb-generator.js:434-437 (P8)


def _embed_texts(texts: list[str], dim: int) -> list[list[float]]:
    out = []
    for t in texts:
        t = (t or "")[:MAX_EMBED_CHARS].lower()
        vec = np.zeros(dim, dtype=np.float64)
        toks = t.split()
        grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
        for g in grams:
            h = hashlib.md5(g.encode()).digest()
            bucket = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            vec[bucket] += sign
        n = float(np.linalg.norm(vec))
        if n > 0:
            vec /= n
        out.append([float(x) for x in vec])
    return out


def make_embed_udf(dim: int = EMBED_DIM):
    @pandas_udf("array<float>")
    def embed_udf(content: pd.Series) -> pd.Series:
        return pd.Series(_embed_texts(content.tolist(), dim))

    return embed_udf


def embed_chunks(
    chunks: DataFrame, dim: int = EMBED_DIM, content_col: str = "content"
) -> DataFrame:
    """chunks → embeddings(chunk_id, embedding) — the S9 sink shape
    ({id, embedding} per chunk, kb-generator.js:477-484)."""
    udf = make_embed_udf(dim)
    return chunks.select(
        "chunk_id", udf(F.col(content_col)).alias("embedding")
    )
