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

Scale shape: shingling, minhashing, and banding are ALL computed
in-row with array expressions (``transform``/``array_min``) — map-only,
no token-stream shuffle at all.  The only shuffles are the band
self-join (bounded bucket sizes — banding exists precisely to keep
buckets tiny at 100 TB, versus the quadratic brute-force join) and the
Jaccard verification, which explodes shingles only for keys that
survived candidate generation (semi-join first).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
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


def shingle_array(text_col) -> "F.Column":
    """array<string> of distinct 3-token shingles, built in-row (no
    explode, no window, no shuffle): tokens via ``split``, windows via
    ``transform`` over an index sequence.  Same shingle set as the
    DuckDB oracle's lead()-window construction."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    # Zip three pre-sliced views of the token array and let the lambda
    # touch only its struct element: referencing `toks` inside the
    # lambda (e.g. element_at(toks, i)) would re-evaluate the split()
    # once per element — O(n²) per document.
    z = F.arrays_zip(
        F.slice(toks, 1, n - 2), F.slice(toks, 2, n - 2), F.slice(toks, 3, n - 2)
    )
    sh = F.transform(z, lambda x: F.concat_ws(" ", x["0"], x["1"], x["2"]))
    return F.when(n >= 3, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(docs: DataFrame, key_col: str = "url", text_col: str = "text") -> DataFrame:
    """(key, shingle) — distinct 3-token shingles; map-only."""
    return docs.select(
        F.col(key_col).alias("key"),
        F.explode(shingle_array(F.col(text_col))).alias("shingle"),
    )


def shingle_sets(
    docs: DataFrame, key_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(key, sh) with sh: array<string> — the un-exploded form used by
    the map-only minhash path."""
    return docs.select(
        F.col(key_col).alias("key"),
        shingle_array(F.col(text_col)).alias("sh"),
    )


def _minhash_cols(sh_arr, n_hashes: int = N_HASHES) -> list:
    """h_i = array_min over md5('{i}|'||shingle) 16-hex prefixes —
    fixed-width hex min == numeric min; computed in-row."""

    def hash_fn(i: int):
        # single-arg lambda: a two-arg callable would make transform()
        # bind the second arg to the ARRAY INDEX, clobbering i
        return lambda s: F.substring(
            F.md5(F.concat_ws("|", F.lit(str(i)), s)), 1, 16
        )

    return [
        F.array_min(F.transform(sh_arr, hash_fn(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]


def minhash_signatures(
    sh: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    """(key, h0..h{K-1}) from exploded (key, shingle) rows — kept for
    oracle-shaped inputs; the pipeline path uses
    :func:`minhash_signatures_from_sets` (zero-shuffle)."""
    hashed = sh.select(
        "key",
        *[
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle"))), 1, 16
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ],
    )
    return hashed.groupBy("key").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    )


def minhash_signatures_from_sets(
    sets_df: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    """(key, h0..h{K-1}) computed entirely in-row from (key, sh) —
    map-only; empty shingle sets (docs with <3 tokens) drop out, same
    as the exploded form."""
    return sets_df.filter(F.size("sh") > 0).select(
        "key", *_minhash_cols(F.col("sh"), n_hashes)
    )


def band_signatures(
    sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """(key, band, band_sig) — per-band concat of minhashes in i-order,
    derived in-row from the signature row (no extra shuffle)."""
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{i}")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("key", F.explode(bands).alias("b")).select(
        "key", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (key_a, key_b), key_a < key_b, sharing ≥1 LSH band."""
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


def pairs_from_shingles(sh: DataFrame) -> DataFrame:
    return _band_pairs(band_signatures(minhash_signatures(sh)))


def neardup_candidate_pairs(
    docs: DataFrame, key_col: str = "url", text_col: str = "text"
) -> DataFrame:
    return _band_pairs(
        band_signatures(
            minhash_signatures_from_sets(shingle_sets(docs, key_col, text_col))
        )
    )


def neardup_pairs(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates verified with exact 3-shingle Jaccard ≥ threshold.

    → (key_a, key_b, jaccard) with jaccard rounded to 6 dp for stable
    cross-engine comparison.

    Plan shape: shingle sets + minhash + bands are one map-only
    projection over docs (cached); the band self-join produces the
    (small) candidate set; verification explodes shingles only for
    keys that appear in some candidate pair (semi-join), so the heavy
    (key, shingle) equi-join runs over candidates' shingles, not the
    whole corpus.
    """
    sets_df = shingle_sets(docs, key_col, text_col).cache()
    # cands feeds three consumers (two key projections + the common-
    # shingle join); cache the tiny pair set so the band self-join and
    # the in-row minhash over the full corpus run exactly once.
    cands = _band_pairs(
        band_signatures(minhash_signatures_from_sets(sets_df))
    ).cache()
    cand_keys = (
        cands.select(F.col("key_a").alias("key"))
        .union(cands.select(F.col("key_b").alias("key")))
        .distinct()
    )
    sh = (
        sets_df.join(cand_keys, "key", "left_semi")
        .select("key", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    )
    sizes = sh.select("key", "n_sh").distinct()
    # Equi-join on (key, shingle) — joining on key alone and filtering
    # shingle equality afterwards would build a per-pair cartesian of
    # the two shingle sets (O(|A|·|B|) per candidate), which explodes
    # as soon as the candidate set is non-trivial.
    common = (
        cands.join(sh.select(F.col("key").alias("key_a"), "shingle"), "key_a")
        .join(
            sh.select(F.col("key").alias("key_b"), "shingle"),
            ["key_b", "shingle"],
        )
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


# --------------------------- SimHash ---------------------------------------

def simhash_py(text: str, bits: int = 64) -> int:
    """Deterministic 64-bit SimHash over whitespace tokens: per-bit
    majority vote of md5-derived token hashes.  Shared by the pandas
    UDF and the pytest twin."""
    import hashlib as _hl

    acc = [0] * bits
    t = text.strip().lower()
    toks = t.split() if t else []
    for tok in toks:
        hv = int.from_bytes(_hl.md5(tok.encode()).digest()[:8], "big")
        for b in range(bits):
            acc[b] += 1 if (hv >> b) & 1 else -1
    sig = 0
    for b in range(bits):
        if acc[b] > 0:
            sig |= 1 << b
    return sig - (1 << 63)  # wrap to signed 64-bit for Spark LongType


def make_simhash_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: simhash_py(t or ""))

    return simhash_udf


def simhash_signatures(
    docs: DataFrame, key_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(key, simhash) — Arrow-batched; map-only."""
    udf = make_simhash_udf()
    return docs.select(
        F.col(key_col).alias("key"), udf(F.col(text_col)).alias("simhash")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4
    16-bit blocks (pigeonhole: hamming ≤ 3 → at least one block equal),
    self-join on (block_idx, block), verify hamming via bit_count.

    The block join is the LSH trick again — candidates per block are
    tiny, no quadratic pass at scale.
    """
    sigs = simhash_signatures(docs, key_col, text_col)
    blocks = sigs.select(
        "key",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("key", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
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
    mins = ",\n         ".join(
        f"min(substr(md5('{i}' || '|' || shingle), 1, 16)) AS h{i}"
        for i in range(N_HASHES)
    )
    band_rows = " UNION ALL ".join(
        "SELECT key, {b} AS band, {sig} AS band_sig FROM sigs".format(
            b=b,
            sig=" || ',' || ".join(
                f"h{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
sigs AS (
  SELECT key, {mins}
  FROM shingles GROUP BY key
),
bands AS (
  {band_rows}
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
