"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine` — JVM-side higher-order-function cosine (zip_with +
  aggregate fold): no UDF, whole-stage codegen, deterministic
  left-to-right double summation.
* :func:`knn_brute_force` — exact top-k against a query vector:
  broadcast the query, map-side score, global top-k (``orderBy +
  limit`` → Spark's TakeOrderedAndProject, which is a per-partition
  top-k + driver merge, NOT a full sort/shuffle).
* :func:`lsh_bucket` / :func:`knn_lsh` — the scale path: random
  hyperplane (SimHash) bucketing with md5-derived deterministic
  hyperplanes; candidates = same bucket, exact re-rank inside.  At
  100 TB brute force is O(N) per query; LSH probes one bucket
  (~N / 2^bits rows).

The *baseline* brute-force variant is the oracle-checked one; LSH is
checked for recall against it in pytest.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to ``query_vec`` → (id, cos_sim)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def auto_lsh_params(
    n_vectors: int,
    target_bucket: int = 4096,
    base_tables: int = 8,
) -> dict:
    """Corpus-size-derived LSH knobs for :func:`embedding_neardup_pairs`
    (r3 ADVICE medium #2's other half — the REGISTERED query pins
    n_bits=3 because the DuckDB twin must be reproducible, but a
    production caller should derive the knobs from |corpus|).

    ``n_bits`` targets an expected bucket of ``target_bucket`` vectors
    (per-group rerank work is O(|bucket|²) flops but O(block·|bucket|)
    memory after row-blocking): n_bits = ceil(log2(n / target_bucket)),
    clamped to [1, 24].  Each +1 bit halves the bucket AND the per-table
    collision probability of a true pair, so recall is recovered by
    growing ``n_tables`` with n_bits (OR-amplification: a pair is a
    candidate if it collides in ANY table) — one extra table per bit
    over the base-8 at the default 3 bits.
    """
    import math

    n_bits = min(24, max(1, math.ceil(
        math.log2(max(n_vectors, 2) / target_bucket)
    )))
    return {
        "n_bits": n_bits,
        "n_tables": base_tables + max(0, n_bits - 3),
        "expected_bucket": max(1, n_vectors >> n_bits),
    }


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = True,
    n_bits: int = 3,
    n_tables: int = 8,
    dim: int | None = None,
    rerank: str = "matmul",
    block_cells: int = 4_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim ≥
    threshold), cos rounded to 4 dp.

    ``bucketed=True`` (default — the registered scale path) restricts
    candidates to pairs colliding in any of ``n_tables`` independent
    ``n_bits``-hyperplane SimHash tables, vs the ``bucketed=False``
    exact quadratic baseline (kept as the pytest recall reference — a
    cross join would be a cartesian product at scale).  Pass ``dim``
    to avoid a probe job.

    ``rerank`` picks how bucket-colliding candidates are scored:

    * ``"matmul"`` (default): ONE ``applyInPandas`` over the
      ``(tbl, bucket)`` groups — each group's cosines are a single
      numpy ``G @ G.T`` and each vector ships into the group shuffle
      once per table (``n_tables × N`` rows), not twice per candidate
      pair; the pair dedup then runs over post-THRESHOLD survivors
      only.  Per-group work is O(|bucket|²) — the same candidate
      count the join variant enumerates row-by-row — and |bucket| is
      the documented scale knob (raise ``n_bits`` with corpus size,
      ``n_tables`` for recall), so groups stay matmul-sized at 100×
      data.  Measured 5.0 s → ~1.3 s on the sf0.1 bench vs the join
      rerank.
    * ``"join"``: equi-join candidate enumeration over narrow
      (id, id) rows, then two joins re-attach vectors/norms and a
      Catalyst HOF fold scores each pair — the semantics twin
      (sequential summation exactly like the DuckDB oracle); pinned
      equal to ``"matmul"`` on the testdata in pytest.
    """
    if bucketed:
        if dim is None:
            probe = embeddings.select(vec_col).first()
            if probe is None:
                # empty input → empty pair set, the shape every other
                # operator produces for empty input (an empty delta /
                # fully-gated corpus slice is a normal pipeline state,
                # not an error)
                id_t = embeddings.schema[id_col].dataType.simpleString()
                return embeddings.sparkSession.createDataFrame(
                    [], f"id_a {id_t}, id_b {id_t}, cos_sim double"
                )
            dim = len(probe[0])

        bucket_udf = make_multitable_bucket_udf(dim, n_bits, n_tables)

        if rerank == "matmul":
            return _neardup_bucket_matmul(
                embeddings, bucket_udf, threshold, id_col, vec_col, dim,
                block_cells=block_cells,
            )

        # one numpy matmul per Arrow batch computes every table's
        # bucket (see make_multitable_bucket_udf — the Catalyst-HOF
        # per-plane fold evaluates interpreted and anti-scales).  The
        # bucketed rows are computed ONCE and lazily checkpointed so
        # the self-join's two sides share the single UDF pass instead
        # of re-running it per side (measured ~2× on the sf0.1 bench).
        eb = embeddings.select(
            F.col(id_col).alias("id"),
            F.posexplode(bucket_udf(F.col(vec_col))).alias("tbl", "bucket"),
        ).localCheckpoint(eager=False)

        # OR-amplified multi-table LSH: a pair is a candidate if it
        # collides in ANY of the n_tables independent n_bits-plane
        # tables (recall 1-(1-p^b)^T vs p^b for one table).  The join
        # is a hash-partitioned equi-join on (table, bucket); at 100×
        # data you raise n_bits (smaller buckets) and n_tables
        # (recall) together — never a cross join.  The band join and
        # the pair dedup run over NARROW (id, id) rows; vectors — with
        # their norms computed ONCE per vector, not once per pair —
        # re-attach afterwards, so the candidate-generation shuffles
        # never carry 64-double payloads (measured 8.3 s → ~3 s at
        # sf0.1's 1.3M candidate pairs).
        joined = (
            eb.select(F.col("id").alias("id_a"), "tbl", "bucket")
            .join(
                eb.select(F.col("id").alias("id_b"), "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        # (id, v, ||v||) — same _norm expression the per-pair cosine
        # used, evaluated once per vector; identical doubles
        vecs = embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        return (
            joined.join(
                vecs.select(
                    F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                    F.col("nrm").alias("nrm_a"),
                ),
                "id_a",
            )
            .join(
                vecs.select(
                    F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                    F.col("nrm").alias("nrm_b"),
                ),
                "id_b",
            )
            .withColumn(
                "cos_sim",
                F.round(
                    _dot(F.col("v_a"), F.col("v_b"))
                    / (F.col("nrm_a") * F.col("nrm_b")),
                    4,
                ),
            )
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn(
            "cos_sim", F.round(cosine(F.col("v_a"), F.col("v_b")), 4)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _neardup_bucket_matmul(
    embeddings: DataFrame,
    bucket_udf,
    threshold: float,
    id_col: str,
    vec_col: str,
    dim: int,
    block_cells: int = 4_000_000,
) -> DataFrame:
    """Per-bucket vectorized rerank (see
    :func:`embedding_neardup_pairs` ``rerank="matmul"``).

    Plan shape: map (bucket UDF + posexplode) → ONE hash shuffle on
    (tbl, bucket) → FlatMapGroupsInPandas (numpy ``G @ G.T`` per
    group, ROW-BLOCKED) → dedup of the post-threshold survivors.  No
    self-join, no per-pair vector re-attach, no interpreted HOF fold.
    float64 blocked summation can differ from the sequential fold by
    ~1 ulp; at 4-dp rounding a flip needs a cosine within ~1e-12 of a
    rounding boundary — measure-zero for real embeddings, and
    matmul==join equality is pinned on the testdata in pytest.

    Memory bound (r3 ADVICE medium): a dense n×n cosine matrix plus
    triu index arrays is ~32 B/pair — multi-GB single allocations once
    a bucket holds ~10^5+ vectors (bucket size grows ~N/2^n_bits with
    the corpus).  The scoring is therefore BLOCKED over the row axis:
    per block of ``B`` rows it materializes a B×n slice (each entry is
    still the same single dot product, so values are unchanged),
    thresholds it, and keeps only survivors — peak extra memory is
    O(B·n) ≈ 32 MB regardless of bucket size, while the vectors
    themselves stream through the shuffle exactly once as before.
    """
    import numpy as np

    eb = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(bucket_udf(F.col(vec_col))).alias("tbl", "bucket"),
    )

    # id columns keep the INPUT id type — embeddings tables in this
    # package are keyed by bigint vec_id OR string chunk_id
    # (embed_chunks), and a hard-coded bigint schema would fail the
    # Arrow conversion for the latter
    id_t = embeddings.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cos_sim double"
    id_dtype = "int64" if id_t in ("bigint", "int", "smallint") else "object"

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=id_dtype),
             "id_b": pd.Series(dtype=id_dtype),
             "cos_sim": pd.Series(dtype="float64")}
        )

    def one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return _empty()
        ids = pdf["id"].to_numpy()
        m = np.asarray(pdf["v"].tolist(), dtype=np.float64).reshape(-1, dim)
        nrm = np.sqrt((m * m).sum(axis=1))
        # block size: ~block_cells float64 cells per row-block
        # slice (32 MB at the 4M default); floor keeps tiny buckets
        # single-block
        blk = max(1, min(n, block_cells // max(n, 1)))
        cols = np.arange(n)
        parts_a, parts_b, parts_c = [], [], []
        for i0 in range(0, n, blk):
            i1 = min(i0 + blk, n)
            # same dot/outer arithmetic as the unblocked form (and the
            # join rerank twin): each entry is dot(m_i, m_j)/(n_i·n_j)
            cos = (m[i0:i1] @ m.T) / np.outer(nrm[i0:i1], nrm)
            # upper triangle only: j > i for each row i in the block
            mask = cols[None, :] > np.arange(i0, i1)[:, None]
            c = np.round(cos[mask], 4)
            keep = c >= threshold
            if not keep.any():
                continue
            ii, jj = np.nonzero(mask)
            parts_a.append(ids[ii[keep] + i0])
            parts_b.append(ids[jj[keep]])
            parts_c.append(c[keep])
        if not parts_a:
            return _empty()
        ia = np.concatenate(parts_a)
        ib = np.concatenate(parts_b)
        # group order is arbitrary → canonicalize id_a < id_b
        # (np.where, not np.minimum: works for object/string ids too,
        # matching the join rerank's lexicographic id_a < id_b)
        swap = ib < ia
        return pd.DataFrame(
            {"id_a": np.where(swap, ib, ia),
             "id_b": np.where(swap, ia, ib),
             "cos_sim": np.concatenate(parts_c)}
        )

    return (
        eb.groupBy("tbl", "bucket")
        .applyInPandas(one_bucket, out_schema)
        # a pair colliding in several tables scores identically in
        # each (same vectors, same arithmetic) — keep one
        .dropDuplicates(["id_a", "id_b"])
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane:{plane_idx}:{counter}".encode()).digest()
        for i in range(0, 16, 2):
            vals.append((int.from_bytes(h[i : i + 2], "big") / 32767.5) - 1.0)
        counter += 1
    return vals[:dim]


def make_multitable_bucket_udf(dim: int, n_bits: int, n_tables: int):
    """pandas UDF: embedding → array of per-table bucket ids — ALL
    tables' hyperplane dots in ONE numpy matmul per Arrow batch.

    This is the scale path for full-table bucketing: the Catalyst twin
    (:func:`lsh_bucket`) builds ``n_tables × n_bits`` higher-order
    ``aggregate``/``zip_with`` folds per row, which Catalyst evaluates
    INTERPRETED — the r1-measured anti-pattern that gets slower with
    more threads.  numpy float64 matmul computes the same dots (blocked
    summation can differ from sequential by ~1 ulp; a sign flip needs a
    dot within ~1e-16 of zero — measure-zero for real embeddings, and
    the hof==udf equality is pinned on the testdata in pytest)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane(dim, t * n_bits + b)
            for t in range(n_tables)
            for b in range(n_bits)
        ],
        dtype=np.float64,
    ).T  # (dim, n_tables*n_bits)
    weights = np.tile(
        np.array([1 << (n_bits - 1 - b) for b in range(n_bits)]), n_tables
    ).reshape(n_tables, n_bits)

    @pandas_udf("array<int>")
    def buckets_udf(emb: pd.Series) -> pd.Series:
        # reshape(-1, dim): an empty Arrow batch gives shape (0,) from
        # tolist(), which would fail the matmul; (0, dim) matmuls to (0, n)
        m = np.asarray(emb.tolist(), dtype=np.float64).reshape(-1, dim)
        bits = (m @ planes) >= 0  # (batch, n_tables*n_bits)
        b = (
            (bits.reshape(len(m), n_tables, n_bits) * weights)
            .sum(axis=2)
            .astype("int32")
        )
        return pd.Series(list(b))

    return buckets_udf


def make_ivf_assign_udf(dim: int, n_centroids: int = 8):
    """pandas UDF twin of :func:`ivf_assign` (1-based first-max list id
    via one numpy matmul per batch)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cents = np.array(
        [_centroid(dim, c) for c in range(n_centroids)], dtype=np.float64
    ).T

    @pandas_udf("int")
    def assign_udf(emb: pd.Series) -> pd.Series:
        # reshape(-1, dim) keeps empty batches matmul-able (see buckets_udf)
        m = np.asarray(emb.tolist(), dtype=np.float64).reshape(-1, dim)
        dots = m @ cents
        return pd.Series((dots.argmax(axis=1) + 1).astype("int32"))

    return assign_udf


def lsh_bucket(
    vec_col: Column, dim: int, n_bits: int = 8, plane_offset: int = 0
) -> Column:
    """SimHash bucket id: sign pattern of ``n_bits`` hyperplane dots.
    ``plane_offset`` selects an independent hyperplane family — table
    t of a multi-table LSH uses ``plane_offset = t * n_bits``."""
    bucket = F.lit(0)
    for b in range(n_bits):
        plane = F.array(
            *[F.lit(v) for v in _hyperplane(dim, plane_offset + b)]
        )
        bucket = bucket * 2 + F.when(_dot(vec_col, plane) >= 0, 1).otherwise(0)
    return bucket


def query_lsh_bucket(query_vec: list[float], dim: int, n_bits: int) -> int:
    """The query vector's SimHash bucket, computed DRIVER-side (a few
    float dots over a dictionary-sized plane set) — the serving-path
    twin of :func:`lsh_bucket` with identical plane literals and
    MSB-first bit order."""
    qb = 0
    for b in range(n_bits):
        plane = _hyperplane(dim, b)
        dot = sum(float(x) * p for x, p in zip(query_vec, plane))
        qb = qb * 2 + (1 if dot >= 0 else 0)
    return qb


def knn_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's SimHash bucket,
    computing bucket assignments INLINE — the ad-hoc / first-query
    shape.  For repeated serving use :func:`build_ann_table` +
    :func:`knn_lsh_kb`, where the assignment is a committed partition
    column and the probe is a partition-pruned scan.  Recall measured
    in tests vs brute force.
    """
    if dim is None:
        dim = len(query_vec)
    qb = query_lsh_bucket(query_vec, dim, n_bits)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = embeddings.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), dim, n_bits)
    )
    return (
        bucketed.filter(F.col("bucket") == qb)
        .select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


# ------------------- committed ANN serving table + probes ------------------

def build_ann_table(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 4,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BUILD-time assignment of both ANN families' probe columns:
    (id, embedding, lsh_bucket, ivf_list).  Written once as a stage
    table partitioned by (lsh_bucket, ivf_list), it turns every
    subsequent :func:`knn_lsh_kb` / :func:`knn_ivf_kb` query into a
    partition-pruned scan of ~N/2^n_bits (resp. ~N·nprobe/n_centroids)
    rows — the assignment UDFs run once per corpus, NEVER per query
    (r2 verdict #1: the inline variants do O(N) assignment work per
    query, which is the scale-killer at 10^12 vectors).

    One numpy matmul per Arrow batch per family; ``lsh_bucket`` uses
    the SAME md5-derived planes as :func:`lsh_bucket`/:func:`knn_lsh`
    (table 0 of the multi-table family — equality vs the Catalyst HOF
    twin is pinned in pytest)."""
    bucket_udf = make_multitable_bucket_udf(dim, n_bits, n_tables=1)
    assign_udf = make_ivf_assign_udf(dim, n_centroids)
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_udf(F.col(vec_col))[0].alias("lsh_bucket"),
        assign_udf(F.col(vec_col)).alias("ivf_list"),
    )


def knn_lsh_kb(
    ann: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH top-k over a COMMITTED :func:`build_ann_table` table: the
    query's bucket is computed driver-side, the scan is pruned to that
    one ``lsh_bucket=`` partition, exact cosine rerank inside — no
    UDF, no full-table assignment at query time."""
    if dim is None:
        dim = len(query_vec)
    qb = query_lsh_bucket(query_vec, dim, n_bits)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ann.filter(F.col("lsh_bucket") == qb)
        .select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def knn_ivf_kb(
    ann: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a COMMITTED :func:`build_ann_table` table: the
    nprobe nearest centroids are found driver-side, the scan is pruned
    to those ``ivf_list=`` partitions, exact cosine rerank inside."""
    if dim is None:
        dim = len(query_vec)
    probes = _query_probe_lists(query_vec, dim, n_centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ann.filter(F.col("ivf_list").isin(probes))
        .select(
            F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def _oracle_bucket_expr(
    dim: int, n_bits: int, v: str, plane_offset: int = 0
) -> str:
    """DuckDB expression computing the SAME SimHash bucket as
    :func:`lsh_bucket` — identical md5-derived hyperplane literals
    (shortest-round-trip float repr parses back to the identical
    double), first plane as the most-significant bit."""
    planes = [_hyperplane(dim, plane_offset + b) for b in range(n_bits)]

    def lit(p: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in p) + "]::DOUBLE[]"

    terms = [
        f"CASE WHEN list_dot_product({v}, {lit(planes[b])}) >= 0 "
        f"THEN {1 << (n_bits - 1 - b)} ELSE 0 END"
        for b in range(n_bits)
    ]
    return "(" + " + ".join(terms) + ")"


def oracle_embedding_neardup_sql(
    threshold: float = 0.4,
    dim: int = 64,
    n_bits: int = 3,
    n_tables: int = 8,
    emb_rel: str = "embeddings",
) -> str:
    """DuckDB twin of the BUCKETED :func:`embedding_neardup_pairs`
    (same hyperplane literals, same multi-table bucket-equality join,
    cos rounded 4dp).  The registered scale path and its oracle share
    the bucketing, so the cross-engine compare is exact; recall of the
    bucketed variant vs the exact quadratic baseline is measured
    separately in pytest."""
    table_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_oracle_bucket_expr(dim, n_bits, 'v', plane_offset=t * n_bits)}"
        f" AS bucket FROM e"
        for t in range(n_tables)
    )
    cos = (
        "round(list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v))), 4)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {emb_rel}),
eb AS (
  {table_rows}
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM eb x JOIN eb y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b, {cos} AS cos_sim
FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b
WHERE {cos} >= {threshold}
"""


# --------------------------- IVF (coarse-quantizer ANN) --------------------

def _centroid(dim: int, idx: int) -> list[float]:
    """Deterministic pseudo-random coarse-quantizer centroid (md5
    stream, distinct tag from the LSH hyperplane family)."""
    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.md5(f"centroid:{idx}:{counter}".encode()).digest()
        for i in range(0, 16, 2):
            vals.append((int.from_bytes(h[i : i + 2], "big") / 32767.5) - 1.0)
        counter += 1
    return vals[:dim]


def ivf_assign(vec_col: Column, dim: int, n_centroids: int = 8) -> Column:
    """1-based id of the max-dot centroid — the IVF list a vector
    belongs to.  On a partitioned table this is the partition column;
    here it is an expression both engines evaluate identically
    (identical centroid literals, identical first-max tie rule)."""
    dots = F.array(
        *[
            _dot(vec_col, F.array(*[F.lit(v) for v in _centroid(dim, c)]))
            for c in range(n_centroids)
        ]
    )
    return F.array_position(dots, F.array_max(dots))


def _query_probe_lists(
    query_vec: list[float], dim: int, n_centroids: int, nprobe: int
) -> list[int]:
    """The nprobe centroid ids (1-based) nearest to the query, by dot."""
    scored = []
    for c in range(n_centroids):
        cv = _centroid(dim, c)
        scored.append(
            (-sum(float(x) * v for x, v in zip(query_vec, cv)), c + 1)
        )
    return [cid for _, cid in sorted(scored)[:nprobe]]


def knn_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: scan only the ``nprobe`` inverted lists
    nearest to the query, exact cosine rerank inside.

    The second ANN family next to :func:`knn_lsh` — IVF probes the
    closest Voronoi cells (graceful recall/nprobe dial), LSH probes a
    hash bucket.  At scale the assignment is a partition/cluster
    column: probing = partition pruning, scanning ~nprobe/n_centroids
    of the table."""
    if dim is None:
        dim = len(query_vec)
    probes = _query_probe_lists(query_vec, dim, n_centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assign_udf = make_ivf_assign_udf(dim, n_centroids)
    assigned = embeddings.withColumn(
        "ivf_list", assign_udf(F.col(vec_col))
    )
    return (
        assigned.filter(F.col("ivf_list").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def oracle_knn_ivf_sql(
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 8,
    nprobe: int = 2,
    emb_rel: str = "embeddings",
    query_vec_id: int = 0,
) -> str:
    """DuckDB twin of :func:`knn_ivf` for a query vector taken from
    the table: identical centroid literals, identical first-max
    assignment (``list_position(l, list_max(l))`` ≡ Spark's
    ``array_position(a, array_max(a))``), and the probe set derived in
    SQL with the same (dot desc, id asc) rule
    :func:`_query_probe_lists` uses."""

    def lit(p: list[float]) -> str:
        return "[" + ",".join(repr(v) for v in p) + "]::DOUBLE[]"

    dots = ", ".join(
        f"list_dot_product(v, {lit(_centroid(dim, c))})"
        for c in range(n_centroids)
    )
    cent_rows = ", ".join(
        f"({c + 1}, {lit(_centroid(dim, c))})" for c in range(n_centroids)
    )
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM {emb_rel}
  WHERE vec_id = {query_vec_id}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM {emb_rel}
  WHERE vec_id <> {query_vec_id}
),
assigned AS (
  SELECT vec_id, v,
         list_position([{dots}], list_max([{dots}])) AS ivf_list
  FROM e
),
qprobe AS (
  SELECT c.cid
  FROM q CROSS JOIN (VALUES {cent_rows}) AS c(cid, cv)
  ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cid
  LIMIT {nprobe}
)
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) AS cos_sim
FROM assigned, q
WHERE ivf_list IN (SELECT cid FROM qprobe)
ORDER BY cos_sim DESC, vec_id
LIMIT {k}
"""


def oracle_knn_lsh_sql(
    k: int = 10,
    dim: int = 64,
    n_bits: int = 4,
    emb_rel: str = "embeddings",
    query_vec_id: int = 0,
) -> str:
    """DuckDB twin of :func:`knn_lsh` for a query vector taken from the
    table itself (bucket parity: see :func:`_oracle_bucket_expr`)."""

    def bucket_expr(v: str) -> str:
        return _oracle_bucket_expr(dim, n_bits, v)

    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM {emb_rel} WHERE vec_id = {query_vec_id}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM {emb_rel}
  WHERE vec_id <> {query_vec_id}
),
eb AS (
  SELECT vec_id, v, {bucket_expr('v')} AS bucket FROM e
),
qb AS (
  SELECT {bucket_expr('qv')} AS bucket FROM q
)
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) AS cos_sim
FROM eb, q, qb
WHERE eb.bucket = qb.bucket
ORDER BY cos_sim DESC, vec_id
LIMIT {k}
"""
