"""Round-4 self-review fixes pinned by regression tests.

1. Blank / padded queries must not crash any search flavor — JS
   ``split(/\\s+/)`` KEEPS empty strings (``''`` → ``['']``) and an
   empty keyword scores every chunk ``length+1``; the engine now
   mirrors that instead of raising on a ``None`` score column.
2. The literal-containment gate (search.js:148): a regex-metacharacter
   keyword must not score chunks that match only as a REGEX.
3. ``generate_answer`` returns the mode DISPLAY name ('Developer'),
   like search.js:384 and the external-search path.
4. ``format_bytes`` ≥ 1 TB degrades like the reference ('N undefined')
   instead of IndexError.
5. The matmul rerank honors the input id type (string chunk_id ids
   from embed_chunks, not just bigint vec_id).
6. ``embedding_neardup_pairs`` on an EMPTY frame returns an empty pair
   set instead of crashing on the dim probe.
7. SimHash near-dup excludes token-less docs (no empty-doc all-pairs
   blowup), Spark and DuckDB twin alike.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from src_to_kb_spark.functions.misc import format_bytes
from src_to_kb_spark.operators.dedup import (
    oracle_simhash_sql,
    simhash_neardup_pairs,
)
from src_to_kb_spark.operators.similarity import embedding_neardup_pairs
from src_to_kb_spark.queries.answers import generate_answer
from src_to_kb_spark.queries.search import (
    keywords_of,
    search_chunks,
    search_chunks_mcp,
    search_documents,
)

CHUNK_SCHEMA = (
    "doc_uid string, url string, lang string, chunk_id string, "
    "content string, start_line int, end_line int"
)


def _chunks(spark, contents):
    return spark.createDataFrame(
        [
            (f"d{i}", f"https://ex.com/f{i}.py", "python", f"c{i}", c, 1, 3)
            for i, c in enumerate(contents)
        ],
        CHUNK_SCHEMA,
    )


def test_keywords_of_mirrors_js_split():
    assert keywords_of("") == [""]
    assert keywords_of("  ") == ["", ""]
    assert keywords_of(" a  b ") == ["", "a", "b", ""]
    assert keywords_of("Spark Join") == ["spark", "join"]


def test_blank_query_scores_all_chunks(spark):
    """JS: keywords=[''] → every chunk scores content.length+1 (empty
    regex matches at every position) — ranked by length, no crash."""
    chunks = _chunks(spark, ["abcdef", "ab", "abcd"])
    rows = search_chunks(chunks, "", mode="developer", limit=10).collect()
    assert [r["score"] for r in rows] == [7, 5, 3]
    rows_mcp = search_chunks_mcp(chunks, "", limit=10).collect()
    assert [r["score"] for r in rows_mcp] == [7, 5, 3]


def test_padded_query_adds_empty_keyword_scores(spark):
    """' x ' → ['', 'x', ''] per JS split: score = 2*(len+1) + count(x)."""
    chunks = _chunks(spark, ["x y x", "y y y"])
    rows = {
        r["chunk_id"]: r["score"]
        for r in search_chunks(chunks, " x ", limit=10).collect()
    }
    assert rows["c0"] == 2 * 6 + 2  # len 5 → 2*(5+1), plus two 'x'
    assert rows["c1"] == 2 * 6  # no 'x', but empty kws still score


def test_blank_query_document_search_no_crash(spark):
    docs = spark.createDataFrame(
        [("https://ex.com/a", "hello"), ("https://ex.com/b", "hi")],
        "url string, text string",
    )
    rows = search_documents(docs, "  ", limit=10).collect()
    assert [r["score"] for r in rows] == [12, 6]  # 2*(len+1)


def test_literal_containment_gate(spark):
    """'spark.' must not score 'sparky' (regex-only match) but must
    score a literal 'spark.' occurrence — search.js:148."""
    chunks = _chunks(spark, ["sparky joins", "uses spark. here"])
    rows = search_chunks(chunks, "spark.", limit=10).collect()
    assert [r["chunk_id"] for r in rows] == ["c1"]
    rows_mcp = search_chunks_mcp(chunks, "spark.", limit=10).collect()
    assert len(rows_mcp) == 1 and rows_mcp[0]["score"] == 1


def test_generate_answer_mode_display_name():
    rows = [
        {
            "url": "a.py",
            "lang": "python",
            "score": 10,
            "context_snippets": ["a long enough snippet about things"],
            "content": "x",
        }
    ]
    assert generate_answer("q", rows, mode="developer")["mode"] == "Developer"
    assert generate_answer("q", rows, mode="enduser")["mode"] == "End User"


def test_format_bytes_tb_degrades_like_reference():
    assert format_bytes(2 * 1024**4) == "2 undefined"
    assert format_bytes(1024**3) == "1 GB"


def test_matmul_rerank_string_ids(spark):
    """String chunk_id ids (embed_chunks output) through the default
    matmul rerank — must equal the join rerank, not crash on a
    hard-coded bigint schema."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.rand(8).tolist()
    rows = [(f"chunk_{i:02d}", [v + 0.01 * i for v in base]) for i in range(6)]
    emb = spark.createDataFrame(
        rows, "chunk_id string, embedding array<double>"
    )
    kw = dict(
        threshold=0.9, id_col="chunk_id", bucketed=True, n_bits=2,
        n_tables=4, dim=8,
    )
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_neardup_pairs(emb, rerank="matmul", **kw).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_neardup_pairs(emb, rerank="join", **kw).collect()
    }
    assert got == want and got
    assert all(a < b for a, b, _ in got)  # lexicographic canonical order


def test_embedding_neardup_empty_input(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = embedding_neardup_pairs(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cos_sim"]


def test_simhash_excludes_tokenless_docs(spark):
    """Empty / whitespace / null texts share the zero signature — they
    must NOT emit all-pairs 'near-dups' between unrelated urls."""
    docs = spark.createDataFrame(
        [
            ("https://ex.com/e1", ""),
            ("https://ex.com/e2", "   \t\n"),
            ("https://ex.com/e3", None),
            ("https://ex.com/a", "alpha beta gamma delta"),
            ("https://ex.com/b", "alpha beta gamma delta"),
        ],
        "url string, text string",
    )
    got = {
        (r["key_a"], r["key_b"])
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert got == {("https://ex.com/a", "https://ex.com/b")}


def test_simhash_tokenless_exclusion_twin_parity(spark):
    """The DuckDB twin applies the identical exclusion (inner join on
    the token aggregate) — parity on a corpus WITH token-less docs."""
    rows = [
        ("https://ex.com/e1", ""),
        ("https://ex.com/e2", " \t "),
        ("https://ex.com/a", "alpha beta gamma delta"),
        ("https://ex.com/b", "alpha beta gamma delta epsilon"),
        ("https://ex.com/c", "totally different words here now"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    got = {
        (r["key_a"], r["key_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs, max_hamming=8).collect()
    }
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else f"'{v}'" for v in row) + ")"
        for row in rows
    )
    sql = (
        f"WITH pages AS (SELECT * FROM (VALUES {vals}) AS t(url, text))"
        + oracle_simhash_sql(max_hamming=8)
    )
    want = {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == want
