"""Mention detection: ``documents`` × gazetteer → ``mentions``
(SURVEY.md §7.2 stage 3; replaces the keyword-scoring inputs of
search.js:132-153 with a dictionary-driven extractor).

Scale shape:
* tokenization is pure Catalyst (``split`` + ``explode`` — JVM-side,
  whole-stage codegen; no Python);
* the token stream is filtered against the **broadcast** alias set
  BEFORE the aggregation, so the shuffle for the per-(doc, alias)
  count carries only matching tokens (a tiny fraction of the corpus) —
  at 100 TB this is the difference between shuffling the whole token
  stream and shuffling ~the mention stream;
* partial aggregation (map-side combine) comes free from groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(docs: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """(key, token) — lower-cased, split on whitespace runs of trimmed text."""
    return docs.select(
        F.col(key_col).alias("key"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")


def detect_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """→ mentions(key, norm, n_mentions).

    One row per (document, matched alias) with its occurrence count.
    """
    tokens = tokenize(docs, key_col, text_col)
    aliases = gazetteer.select("norm").distinct()
    return (
        tokens.join(F.broadcast(aliases), tokens.token == aliases.norm)
        .groupBy("key", "norm")
        .agg(F.count("*").alias("n_mentions"))
    )


def oracle_mentions_cte(pages_rel: str = "pages", gaz_rel: str = "gazetteer") -> str:
    """DuckDB twin of detect_mentions over a pages-shaped relation."""
    return f"""
tok AS (
  SELECT url AS key,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM {pages_rel}
),
mentions AS (
  SELECT t.key, t.token AS norm, count(*) AS n_mentions
  FROM tok t
  JOIN (SELECT DISTINCT norm FROM {gaz_rel}) g ON t.token = g.norm
  WHERE t.token <> ''
  GROUP BY 1, 2
)"""
