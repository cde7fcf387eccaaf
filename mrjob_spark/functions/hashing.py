"""Deterministic, engine-portable hashing (SURVEY.md §2.8 F7).

The reference uses SHA1-of-text for deterministic splits
(``mrjob/examples/mr_text_classifier.py:40-43``); we standardize on md5
because every SQL engine agrees on its hex encoding, which makes these
hashes usable in DuckDB-oracle-checked queries (unlike ``F.hash``/``xxhash64``
whose algorithms are Spark-specific).

All arithmetic stays inside 63-bit signed range: ``hex_hash32`` < 2^32 and
minhash multipliers < 2^30, so ``a*h + b`` < 2^62 — safe for BIGINT in both
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^61-1: modulus for minhash affine transforms.
MERSENNE_61 = (1 << 61) - 1

#: Deterministic affine constants for the minhash family (seeded once,
#: hard-coded so Spark and the SQL oracle agree). a_i odd, < 2^30.
MINHASH_A = [
    536870923, 402653189, 268435459, 134217757,
    67108879, 33554467, 16777259, 8388617,
    4194319, 2097169, 1048583, 524309,
    262147, 131101, 65537, 32771,
]
MINHASH_B = [
    97, 193, 389, 769, 1543, 3079, 6151, 12289,
    24593, 49157, 98317, 196613, 393241, 786433, 1572869, 3145739,
]

NUM_MINHASHES = len(MINHASH_A)


def hex_hash64(col: Column) -> Column:
    """First 15 hex chars of md5 → BIGINT in [0, 2^60). Portable to SQL as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hex_hash32(col: Column) -> Column:
    """First 8 hex chars of md5 → BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def minhash_columns(h: Column) -> list[Column]:
    """The k affine minhash transforms of a 32-bit token hash column."""
    return [
        F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE_61))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def sql_hex_hash64(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`hex_hash64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_hex_hash32(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`hex_hash32`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def sql_minhash_exprs(h_expr: str) -> list[str]:
    """DuckDB SQL equivalents of :func:`minhash_columns`."""
    return [
        f"(({a} * {h_expr} + {b}) % {MERSENNE_61})"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
