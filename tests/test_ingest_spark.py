"""End-to-end Spark parity for the extract + chunk stages.

The Spark path (pandas UDFs) must agree byte-for-byte with the pure
Python core — which itself is pinned to the reference by goldens — on
the adversarial synthetic pages fixture (CRLF, NBSP, comments, blank
runs, chunk-stress page, skewed hosts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from src_to_kb_spark.core.textproc import clean_content, create_chunks
from src_to_kb_spark.operators.chunker import chunk_documents
from src_to_kb_spark.operators.extract import extract_pages
from src_to_kb_spark.sources.pages import synthetic_pages, synthetic_pages_rows


def test_extract_parity(spark):
    pages = synthetic_pages(spark, n=120)
    docs = extract_pages(pages).select("url", "text", "checksum", "lines").collect()
    expected = {
        url: clean_content(raw) for url, _, _, raw, _ in synthetic_pages_rows(120)
    }
    assert len(docs) == 120
    for row in docs:
        exp = expected[row["url"]]
        assert row["text"] == exp, f"byte mismatch for {row['url']}"
        assert row["lines"] == len(exp.split("\n"))


def test_chunk_parity(spark):
    pages = synthetic_pages(spark, n=60)
    docs = extract_pages(pages)
    chunks = chunk_documents(docs).collect()
    expected = {}
    for url, _, _, raw, _ in synthetic_pages_rows(60):
        expected[url] = create_chunks(clean_content(raw), 1000, 200)
    by_url: dict[str, list] = {}
    for r in chunks:
        by_url.setdefault(r["url"], []).append(r)
    assert set(by_url) == set(expected)
    for url, got in by_url.items():
        got.sort(key=lambda r: r["chunk_index"])
        exp = expected[url]
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert g["content"] == e["content"]
            assert g["start_line"] == e["start_line"]
            assert g["end_line"] == e["end_line"]
            assert g["size"] == e["size"]
            assert g["chunk_id"] == f"{g['doc_uid']}_chunk_{e['index']}"
    # stress page produced >20 chunks
    stress = [u for u in expected if u.endswith("/p0.js")]
    assert stress and len(expected[stress[0]]) > 20


def test_extract_plan_is_map_only(spark):
    pages = synthetic_pages(spark, n=10)
    docs = extract_pages(pages)
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "extract stage must not shuffle"


def test_size_gate(spark):
    pages = synthetic_pages(spark, n=30)
    out = extract_pages(pages, max_file_size=100)
    assert out.count() == pages.filter(F.length("html") <= 100).count()
