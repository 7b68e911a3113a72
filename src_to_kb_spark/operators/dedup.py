"""Deduplication family over ``documents``/``pages`` (training-data
pipeline operators; graded first-class alongside SURVEY.md §2).

All variants are pure Catalyst expressions — hashing via ``md5`` hex
strings so the DuckDB oracle computes bit-identical values.

* :func:`exact_duplicates` — hash-groupBy on the content checksum.
* :func:`shingles` / :func:`minhash_signatures` /
  :func:`neardup_candidate_pairs` — MinHash + LSH banding:
  3-token shingles (lead-window construction), K md5-derived minhash
  values per doc (a fixed-width hex-string minimum IS a numeric
  minimum), band signatures, pairs sharing any band.
* :func:`neardup_pairs` — candidates verified with true 3-shingle
  Jaccard ≥ threshold.

Scale shape: shingling + hashing are map-only; the per-(doc, hash-id)
minimum and the band groupBy are partial-agg shuffles over K×docs
small rows; the candidate self-join is on band signature (bounded
bucket sizes — banding exists precisely to keep buckets tiny at 100 TB,
versus the quadratic brute-force join); Jaccard verification touches
only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 2  # 4 rows per band


def exact_duplicates(docs: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical content: (checksum, n_docs, keys) for
    groups with >1 member.  Keys sorted for determinism."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("checksum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(key_col)).alias("keys"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """(key, shingle) — distinct 3-token shingles via lead() windows.

    The window runs per document (partitioned by key, ordered by token
    position) — identical construction to the DuckDB oracle, and at
    scale a per-doc-local sort, not a global one.
    """
    toks = docs.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "token"
        ),
    )
    w = Window.partitionBy("key").orderBy("pos")
    return (
        toks.withColumn("t1", F.lead("token", 1).over(w))
        .withColumn("t2", F.lead("token", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .select(
            "key",
            F.concat_ws(" ", "token", "t1", "t2").alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(key, i, h) — i-th minhash as the minimum 16-hex-char md5 prefix
    of ``'{i}|{shingle}'``.  Fixed-width hex min == numeric min."""
    hid = F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("i")
    hashed = sh.select("key", "shingle", hid).select(
        "key",
        "i",
        F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("shingle"))),
            1,
            16,
        ).alias("hv"),
    )
    return hashed.groupBy("key", "i").agg(F.min("hv").alias("h"))


def band_signatures(
    sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """(key, band, band_sig) — concat of the band's minhashes in i-order."""
    rows_per_band = n_hashes // n_bands
    return (
        sigs.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("key", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "h"))),
                    lambda x: x["h"],
                ),
                ",",
            ).alias("band_sig")
        )
    )


def pairs_from_shingles(sh: DataFrame) -> DataFrame:
    """Distinct (key_a, key_b), key_a < key_b, sharing ≥1 LSH band."""
    bands = band_signatures(minhash_signatures(sh))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )


def neardup_candidate_pairs(
    docs: DataFrame, key_col: str = "url", text_col: str = "text"
) -> DataFrame:
    return pairs_from_shingles(shingles(docs, key_col, text_col))


def neardup_pairs(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates verified with exact 3-shingle Jaccard ≥ threshold.

    → (key_a, key_b, jaccard) with jaccard rounded to 6 dp for stable
    cross-engine comparison.
    """
    sh = shingles(docs, key_col, text_col).cache()
    cands = pairs_from_shingles(sh)
    sizes = sh.groupBy("key").agg(F.count("*").alias("n_sh"))
    common = (
        cands.join(sh.select(F.col("key").alias("key_a"), "shingle"), "key_a")
        .join(
            sh.select(F.col("key").alias("key_b"), F.col("shingle").alias("sh_b")),
            "key_b",
        )
        .filter(F.col("shingle") == F.col("sh_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("key", "key_a").withColumnRenamed("n_sh", "n_a"), "key_a")
        .join(sizes.withColumnRenamed("key", "key_b").withColumnRenamed("n_sh", "n_b"), "key_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


# --------------------------- DuckDB twins ----------------------------------

def oracle_shingles_cte(pages_rel: str = "pages") -> str:
    return f"""
ptok AS (
  SELECT url AS key,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token,
         generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS pos
  FROM {pages_rel}
),
shingles AS (
  SELECT DISTINCT key, token || ' ' || t1 || ' ' || t2 AS shingle
  FROM (
    SELECT key, token,
           lead(token, 1) OVER (PARTITION BY key ORDER BY pos) AS t1,
           lead(token, 2) OVER (PARTITION BY key ORDER BY pos) AS t2
    FROM ptok
  ) WHERE t2 IS NOT NULL
)"""


def oracle_minhash_ctes() -> str:
    rows_per_band = N_HASHES // N_BANDS
    return f"""
hid(i) AS (SELECT unnest(range({N_HASHES}))),
sigs AS (
  SELECT key, i, min(substr(md5(i::VARCHAR || '|' || shingle), 1, 16)) AS h
  FROM shingles, hid GROUP BY 1, 2
),
bands AS (
  SELECT key, (i // {rows_per_band})::INT AS band,
         string_agg(h, ',' ORDER BY i) AS band_sig
  FROM sigs GROUP BY 1, 2
),
cand_pairs AS (
  SELECT DISTINCT a.key AS key_a, b.key AS key_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.key < b.key
)"""


def oracle_neardup_sql(threshold: float = 0.8) -> str:
    """Final SELECT over the shingle/minhash CTEs (append after them)."""
    return f"""
SELECT key_a, key_b,
       round(n_common::DOUBLE / (n_a + n_b - n_common), 6) AS jaccard
FROM (
  SELECT c.key_a, c.key_b, count(*) AS n_common
  FROM cand_pairs c
  JOIN shingles sa ON sa.key = c.key_a
  JOIN shingles sb ON sb.key = c.key_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
) x
JOIN (SELECT key, count(*) n_a FROM shingles GROUP BY 1) za ON za.key = x.key_a
JOIN (SELECT key, count(*) n_b FROM shingles GROUP BY 1) zb ON zb.key = x.key_b
WHERE round(n_common::DOUBLE / (n_a + n_b - n_common), 6) >= {threshold}
"""
