"""Deduplication operators (SURVEY.md §2.11 L1/L2): exact, normalized,
MinHash+LSH, SimHash, exact n-gram Jaccard, embedding-cosine near-dup.

All are pure DataFrame compositions — hashing is md5-based (engine-portable,
see functions/hashing.py) and every shuffle is on a key whose cardinality
scales with the data (shingle hash, band hash, label bucket), never an
all-pairs cross join. The LSH path is the 100 TB design: candidate
generation cost is O(docs x bands), verification touches only colliding
pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from mrjob_spark.functions.rounding import rnd

from mrjob_spark.functions.hashing import (
    MERSENNE_61,
    MINHASH_A,
    MINHASH_B,
    hex_hash32,
    sql_hex_hash32,
)
from mrjob_spark.functions.text import (
    char_shingles,
    distinct_tokens,
    normalize_text,
    sql_normalize_text,
    sql_tokens,
)
from mrjob_spark.functions.vectors import cosine_similarity

# ---------------------------------------------------------------------------
# L1: exact + normalized dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one representative (min id) per distinct
    text hash, plus the duplicate count. Partial aggregation makes this a
    single well-combined shuffle at any scale."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def normalized_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup after canonicalization (lowercase, collapse punctuation/
    whitespace) — catches trivially-reformatted duplicates."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("norm_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# L2: MinHash + LSH
# ---------------------------------------------------------------------------

SHINGLE_N = 8
NUM_BANDS = 4
ROWS_PER_BAND = 4  # NUM_BANDS * ROWS_PER_BAND == len(MINHASH_A)


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, shingle_hash32) pairs per document."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(char_shingles(F.col(text_col), SHINGLE_N)).alias("shingle"),
        )
        .select("doc_id", hex_hash32(F.col("shingle")).alias("h"))
        .distinct()
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """doc_id + m0..m15 minhash columns over 8-char shingles."""
    sh = _shingle_hashes(df, id_col, text_col)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE_61))).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.6
) -> DataFrame:
    """Near-duplicate pairs: LSH banding for candidates, exact shingle
    Jaccard for verification. Returns (doc_a, doc_b, jaccard >= threshold).

    Shuffles: shingle distinct, signature groupBy, band self-join, candidate
    verification join — all on scalable keys. No cross join anywhere.
    """
    sig = minhash_signatures(df, id_col, text_col).cache()
    band_rows = []
    for b in range(NUM_BANDS):
        cols = [
            F.col(f"m{b * ROWS_PER_BAND + r}").cast("string")
            for r in range(ROWS_PER_BAND)
        ]
        band_rows.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("-", *cols)).alias("band_hash"),
            )
        )
    bands = band_rows[0]
    for extra in band_rows[1:]:
        bands = bands.unionByName(extra)

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = _shingle_hashes(df, id_col, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.h") == F.col("sa.h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("za.doc_id") == F.col("doc_a"))
        .join(sizes.alias("zb"), F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            rnd(
                F.col("n_inter").cast("double")
                / (F.col("za.n") + F.col("zb.n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def sql_minhash_lsh_pairs(threshold: float = 0.6) -> str:
    """DuckDB oracle mirroring :func:`minhash_lsh_pairs` exactly."""
    h32 = sql_hex_hash32("substr(t, i, %d)" % SHINGLE_N)
    mins = ", ".join(
        f"min(({a} * h + {b}) % {MERSENNE_61}) AS m{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5(concat_ws('-', {cols})) AS band_hash FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(m{b * ROWS_PER_BAND + r} AS VARCHAR)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(NUM_BANDS)
    )
    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, {h32} AS h FROM (
            SELECT doc_id, lower(text) AS t,
                   unnest(generate_series(1, greatest(length(text) - {SHINGLE_N - 1}, 1))) AS i
            FROM documents
        )
    ), sig AS (
        SELECT doc_id, {mins} FROM sh GROUP BY doc_id
    ), bands AS (
        {band_selects}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_inter
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           (floor((CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter)) * 1000000 + 0.5) / 1000000) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE (floor((CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter)) * 1000000 + 0.5) / 1000000) >= {threshold}
    """


# ---------------------------------------------------------------------------
# L2b: SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over word tokens: bit j is the sign of the sum of
    (+1/-1) votes from each token's hash bit j. Whole computation is
    explode + groupBy — two shuffle-free projections and one aggregation."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("token"),
    ).select("doc_id", hex_hash32(F.col("token")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select("doc_id", fp.cast("bigint").alias("simhash"))


def sql_simhash_fingerprints() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, {sql_hex_hash32('token')} AS h FROM (
            SELECT doc_id, unnest(list_distinct({sql_tokens('text')})) AS token
            FROM documents
        )
    ), agg AS (
        SELECT doc_id, {votes} FROM tok GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg
    """


# ---------------------------------------------------------------------------
# L2c: exact n-gram (token) Jaccard pairs — the brute-force baseline the LSH
# path approximates; usable directly at moderate scale.
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold via an inverted-index
    join on tokens. Exact, but candidate volume is sum(df_token^2) — at
    large corpus sizes use minhash_lsh_pairs instead."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("token"),
    ).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("za.doc_id") == F.col("doc_a"))
        .join(sizes.alias("zb"), F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            rnd(
                F.col("n_inter").cast("double")
                / (F.col("za.n") + F.col("zb.n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def sql_jaccard_pairs(threshold: float = 0.5) -> str:
    return f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(list_distinct({sql_tokens('text')})) AS token
            FROM documents
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           (floor((CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter)) * 1000000 + 0.5) / 1000000) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE (floor((CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter)) * 1000000 + 0.5) / 1000000) >= {threshold}
    """


# ---------------------------------------------------------------------------
# L2d: embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Near-duplicate embedding pairs within a blocking bucket (here the
    precomputed cluster/label — the IVF pattern: compare only within the
    same coarse cell, which turns an O(n^2) cross join into a per-bucket
    join that parallelizes by bucket)."""
    a = df.alias("a")
    b = df.alias("b")
    sim = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(
            b,
            (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            rnd(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
