"""Skew handling: the synthetic corpus really is host-skewed, and the
salted repartition really balances it."""

from __future__ import annotations

from pyspark.sql import functions as F

from src_to_kb_spark.runtime.skew import (
    host_distribution,
    partition_balance,
    salted_repartition,
)
from src_to_kb_spark.sources.pages import synthetic_pages


def test_fixture_is_skewed_and_salting_balances(spark):
    pages = synthetic_pages(spark, n=400)
    dist = host_distribution(pages).collect()
    total = sum(r["n_rows"] for r in dist)
    # ~30% of rows on one host (FIXTURES.md §1) — skew is real
    assert dist[0]["n_rows"] / total > 0.2

    # plain host partitioning: hot host lands in ONE partition
    plain = pages.repartition(8, F.parse_url(F.col("url"), F.lit("HOST")))
    plain_balance = partition_balance(plain)
    assert max(plain_balance) / (total / 8) > 1.5  # straggler exists

    salted = salted_repartition(pages, n_partitions=8, salt=16)
    balance = partition_balance(salted)
    assert len(balance) == 8
    # no partition more than 1.5x the mean after salting
    assert max(balance) / (total / 8) < 1.5
    assert sum(balance) == total
