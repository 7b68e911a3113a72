"""Query-layer parity vs the reference engine.

fixtures/golden_search.json was produced by RUNNING the reference
(tools/gen_search_goldens.py → kb-generator + search.js over the same
synthetic pages materialized as a file tree).  These tests assert our
Spark query layer returns the same result SETS (scores, line spans,
snippets, statistics, similarity scores) — ordering aside, since the
reference's tie order is Map-insertion order, which is not a semantic.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from src_to_kb_spark.operators.chunker import chunk_documents
from src_to_kb_spark.operators.extract import extract_pages
from src_to_kb_spark.queries.search import (
    lang_distribution,
    search_by_type,
    search_chunks,
    similar_documents,
)
from src_to_kb_spark.sources.pages import synthetic_pages_rows

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_search.json")

with open(FIXTURE, encoding="utf-8") as f:
    GOLD = json.load(f)

N_PAGES = GOLD["_meta"]["n_pages"]


def _relpath(url: str) -> str:
    return "/".join(url.split("/")[3:])


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        (_relpath(u), ts, h, t, lg)
        for u, ts, h, t, lg in synthetic_pages_rows(N_PAGES)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    docs = extract_pages(pages)
    # the reference's documentLang is extension-derived (detectLanguage)
    docs = docs.withColumn("lang", F.col("language_ext")).cache()
    chunks = chunk_documents(docs).cache()
    return docs, chunks


@pytest.mark.parametrize("key", list(GOLD["searches"].keys()))
def test_search_parity(kb, key):
    docs, chunks = kb
    mode, query = key.split("||")
    got = search_chunks(chunks, query, mode=mode, limit=10**7).collect()
    got_set = {
        (
            r["url"],
            f"{r['start_line']}-{r['end_line']}",
            r["score"],
            tuple(r["context_snippets"]),
        )
        for r in got
    }
    exp_set = {
        (r["path"], r["lines"], r["score"], tuple(r["snippets"]))
        for r in GOLD["searches"][key]
    }
    assert got_set == exp_set


def test_statistics_parity(kb, spark):
    docs, chunks = kb
    stats = GOLD["stats"]
    assert docs.count() == stats["totalDocuments"]
    assert chunks.count() == stats["totalChunks"]
    assert docs.agg(F.sum("size")).first()[0] == stats["totalSize"]
    langs = {r["lang"]: r["n_docs"] for r in lang_distribution(docs).collect()}
    assert langs == stats["languages"]
    types = {
        r["type"]: r["cnt"]
        for r in docs.groupBy("type").agg(F.count("*").alias("cnt")).collect()
    }
    assert types == stats["types"]


@pytest.mark.parametrize("t", ["code", "Python", "web"])
def test_by_type_parity(kb, t):
    docs, _ = kb
    got = {r["url"] for r in search_by_type(docs, t).collect()}
    exp = {r["path"] for r in GOLD["byType"][t]}
    assert got == exp


@pytest.mark.parametrize("target", list(GOLD["similar"].keys()))
def test_similar_parity(kb, target):
    docs, _ = kb
    got = {
        (r["url"], r["lang"], r["similarity"])
        for r in similar_documents(docs, target).collect()
    }
    exp = {
        (r["path"], r["language"], r["similarity"])
        for r in GOLD["similar"][target]
    }
    assert got == exp
