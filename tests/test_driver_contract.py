"""Replicates the grading driver's queries()-vs-oracle_sql() check at
smoke scale: for every query with a registered oracle, run the Spark
DataFrame and the DuckDB SQL on the same parquet tables, sort columns
by name and rows by all columns, and compare values (doubles to 6 dp).

This is the local early-warning twin of the per-round
CORRECTNESS_r{N}.json gate.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in order) for row in data
    )


ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_SMOKE)
    spark_rows = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.sql(ORACLES[name])
    duck_rows = _rows(list(rel.columns), rel.fetchall())
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
