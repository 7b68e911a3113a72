"""Canonicalization: near-duplicate / same-entity groups via
connected components (SURVEY.md §7.2 stage 5).

Input: undirected edges (key_a, key_b) — e.g. verified near-dup pairs
or MinHash-matched entity-name pairs.  Output: (key, canon_id) where
``canon_id`` is the minimum key of the component (deterministic
labeling), including singleton members of the input node set.

Algorithm: iterative min-label propagation over DataFrames —
each round every node adopts the minimum label in its closed
neighborhood; converges in O(diameter) rounds.  No GraphFrames
dependency.  Each round is one shuffle on the node key;
``localCheckpoint`` truncates lineage so plans stay bounded (the
standard pattern for iterative DataFrame algorithms at scale).

The DuckDB oracle expresses the same fixpoint with a recursive CTE
(transitive closure + min), so canonicalization is fully
oracle-checkable at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """edges(key_a, key_b) [+ nodes(key)] → (key, canon_id)."""
    sym = edges.select(
        F.col("key_a").alias("src"), F.col("key_b").alias("dst")
    ).union(edges.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst")))
    node_df = sym.select(F.col("src").alias("key")).distinct()
    if nodes is not None:
        node_df = node_df.union(nodes.select("key")).distinct()

    labels = node_df.select("key", F.col("key").alias("label")).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # min label over closed neighborhood
        neighbor_labels = (
            sym.join(labels, sym.dst == labels.key)
            .select(F.col("src").alias("key"), "label")
        )
        new_labels = (
            labels.select("key", "label")
            .union(neighbor_labels)
            .groupBy("key")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "key")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("key", F.col("label").alias("canon_id"))


def oracle_components_sql(edges_cte: str = "pairs") -> str:
    """Recursive-CTE twin: transitive closure then min label per node.

    Append after CTEs that define ``{edges_cte}(key_a, key_b)``.
    """
    return f"""
, sym AS (
  SELECT key_a AS src, key_b AS dst FROM {edges_cte}
  UNION SELECT key_b, key_a FROM {edges_cte}
),
reach AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
)
SELECT key, min(lbl) AS canon_id FROM (
  SELECT src AS key, dst AS lbl FROM reach
  UNION ALL
  SELECT DISTINCT src AS key, src AS lbl FROM sym
) GROUP BY key
"""
