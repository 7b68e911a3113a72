"""Golden parity + property tests for the pure-Python textproc core.

Goldens were produced by RUNNING the reference implementation
(tools/gen_goldens.mjs over /root/reference/kb-generator.js) — this is
the byte-identical invariant from BASELINE.json input_hint.
"""

from __future__ import annotations

import json
import os

import pytest

from src_to_kb_spark.core.textproc import clean_content, create_chunks

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")

with open(os.path.join(FIXTURES, "golden_textproc.json"), encoding="utf-8") as f:
    GOLDENS = json.load(f)


@pytest.mark.parametrize(
    "case", GOLDENS, ids=[f"{c['name']}-{c['mode']}" for c in GOLDENS]
)
def test_golden_parity(case):
    include_comments = case["mode"] == "with_comments"
    cleaned = clean_content(case["input"], include_comments=include_comments)
    assert cleaned == case["cleaned"], "cleaned text must be byte-identical"

    cs, ov = (120, 40) if case["name"].endswith("@120/40") else (1000, 200)
    got = create_chunks(case["cleaned"], cs, ov)
    ref = [
        {
            "index": c["index"],
            "content": c["content"],
            "start_line": c["startLine"],
            "end_line": c["endLine"],
            "size": c["size"],
        }
        for c in case["chunks"]
    ]
    assert [dict(c) for c in got] == ref


def test_overlap_property():
    """Structural form of the reference's overlap check
    (scripts/test.js:325-331, which only prints): chunk k+1 begins with
    the carried tail lines of chunk k — the line span
    [b.start_line, a.end_line] holds identical content in both."""
    text = "\n".join(f"line {i} " + "x" * (i % 37) for i in range(500))
    chunks = create_chunks(clean_content(text), 1000, 200)
    assert len(chunks) > 3
    for a, b in zip(chunks, chunks[1:]):
        assert b["start_line"] <= a["end_line"], "carry is at least one line"
        # Reference quirk (kb-generator.js:396): after a carry of n lines
        # starting at line i, startLine = i-(n-1) — one PAST the true
        # first carried line (i-n).  Goldens pin it; account for it here.
        n_carry = a["end_line"] - b["start_line"] + 2
        a_lines = a["content"].split("\n")
        b_lines = b["content"].split("\n")
        assert b_lines[:n_carry] == a_lines[-n_carry:]


def test_monotone_lines_and_final_chunk():
    text = "\n".join("word " * 10 for _ in range(300))
    chunks = create_chunks(clean_content(text), 1000, 200)
    for c in chunks:
        assert c["start_line"] <= c["end_line"]
    starts = [c["start_line"] for c in chunks]
    assert starts == sorted(starts)
    assert chunks[-1]["end_line"] == len(clean_content(text).split("\n")) - 1


def test_empty_text_yields_one_chunk():
    assert len(create_chunks("", 1000, 200)) == 1


def test_chunker_oracle_cte_matches_python_on_stress_docs():
    """The DuckDB recursive-CTE chunker twin must replicate
    create_chunks exactly on multi-chunk documents (the sf corpora are
    single-chunk, so this is the only coverage of carries, the
    recomputed-size quirk, and the start_line off-by-one quirk)."""
    import random

    import duckdb

    from src_to_kb_spark.core.textproc import create_chunks
    from src_to_kb_spark.operators.chunker import oracle_chunks_ctes

    random.seed(42)
    cases = {
        "stress": "\n".join(
            "line %03d " % i + "x" * random.randint(0, 120)
            for i in range(120)
        ),
        "empty": "",
        "bigline": "y" * 5000,
        "ragged": "\n".join(
            "z" * random.randint(0, 300) for _ in range(80)
        ),
        "newlines": "\n\n\n\n",
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE p (url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", list(cases.items()))
    sql = (
        "WITH RECURSIVE pages AS (SELECT url, 'x' AS lang, text FROM p),\n"
        + oracle_chunks_ctes().strip().lstrip(",")
        + "\nSELECT url, chunk_index, content, start_line, end_line, size"
        " FROM chunks_r ORDER BY url, chunk_index"
    )
    duck: dict[str, list[tuple]] = {}
    for r in con.sql(sql).fetchall():
        duck.setdefault(r[0], []).append(tuple(r[1:]))
    for name, text in cases.items():
        py = [
            (c["index"], c["content"], c["start_line"], c["end_line"],
             c["size"])
            for c in create_chunks(text, 1000, 200)
        ]
        assert py == duck.get(name, []), name
