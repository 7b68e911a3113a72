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
    driver_threshold: int | None = 5_000_000,
) -> DataFrame:
    """edges(key_a, key_b) [+ nodes(key)] → (key, canon_id).

    Hybrid strategy: LSH-verified candidate graphs are sparse, so when
    the edge set fits comfortably on the driver (≤ ``driver_threshold``
    edges) a local union-find labels it in one pass — same labels, two
    jobs total.  A few million collected edge rows is well within any
    driver's budget and union-find is near-linear, whereas each
    label-propagation round costs several barriered jobs — so the
    threshold is deliberately generous.  Above it (or with
    ``driver_threshold=None``) the distributed min-label propagation
    runs; that path is the one that matters at 10^12 documents, where
    the pair set itself can be billions of rows.
    """
    # Checkpoint the symmetrized edges FIRST and derive the node set
    # from the checkpointed plan — deriving it from the pre-checkpoint
    # plan would re-run the (expensive) upstream pair computation a
    # second time when nodes are materialized.
    sym = (
        edges.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .union(
            edges.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst"))
        )
        .localCheckpoint()
    )
    node_df = sym.select(F.col("src").alias("key")).distinct()
    if nodes is not None:
        node_df = node_df.union(nodes.select("key")).distinct()

    if driver_threshold is not None and sym.count() <= driver_threshold:
        return _components_driver(edges.sparkSession, sym, node_df)

    labels = node_df.select("key", F.col("key").alias("label")).localCheckpoint()

    for it in range(max_iter):
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
        )
        # truncate lineage every few rounds; cache in between
        if it % 4 == 3:
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.cache()
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


def _components_driver(spark, sym: DataFrame, node_df: DataFrame) -> DataFrame:
    """Union-find on collected edges — the small-graph fast path.

    Arrow end-to-end: ``toPandas`` for the collect and a pandas frame
    back through ``createDataFrame`` — the Row-object ``collect()`` /
    list-of-tuples paths are 10-50× slower and turn this stage into a
    serial bottleneck near the edge-count threshold.
    """
    import pandas as pd

    spdf = sym.toPandas()
    nodes = node_df.toPandas()["key"].tolist()
    parent: dict[str, str] = {n: n for n in nodes}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(spdf["src"].tolist(), spdf["dst"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[str, list[str]] = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    keys: list[str] = []
    canons: list[str] = []
    for members in groups.values():
        canon = min(members)
        keys.extend(members)
        canons.extend([canon] * len(members))
    out = pd.DataFrame({"key": keys, "canon_id": canons})
    return spark.createDataFrame(out)


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


def oracle_components_cte(edges_cte: str = "pairs", name: str = "comp") -> str:
    """Same fixpoint as :func:`oracle_components_sql`, but ending in a
    named CTE ``{name}(key, canon_id)`` for composition into larger
    oracle queries (e.g. the full-pipeline triples twin)."""
    return f"""
, csym AS (
  SELECT key_a AS src, key_b AS dst FROM {edges_cte}
  UNION SELECT key_b, key_a FROM {edges_cte}
),
creach AS (
  SELECT src, dst FROM csym
  UNION
  SELECT r.src, s.dst FROM creach r JOIN csym s ON r.dst = s.src
),
{name} AS (
  SELECT key, min(lbl) AS canon_id FROM (
    SELECT src AS key, dst AS lbl FROM creach
    UNION ALL
    SELECT DISTINCT src AS key, src AS lbl FROM csym
  ) GROUP BY key
)"""
