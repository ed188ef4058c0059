"""Portable deterministic hashing — identical results in Spark and DuckDB.

Spark's hash()/xxhash64() and DuckDB's hash() are different algorithms, so
every hash the correctness oracle must reproduce is derived from md5 (both
engines implement RFC 1321 identically): take the first `nchars` hex digits
and parse them as an integer.

Used by: exact dedup keys, MinHash shingle hashing, SimHash token bits,
document fingerprints, deterministic synthetic-data derivation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61-1 (Mersenne prime) — modulus for the MinHash permutation family.
MERSENNE_P = (1 << 61) - 1


def md5i(col: Column, nchars: int = 8) -> Column:
    """First nchars hex digits of md5 as a non-negative long (Catalyst-only).

    nchars ≤ 15 keeps the value inside a signed 64-bit long.
    """
    assert 1 <= nchars <= 15
    return F.conv(F.substring(F.md5(col.cast("string")), 1, nchars), 16, 10).cast("long")


def md5i_sql(expr: str, nchars: int = 8) -> str:
    """The same integer in DuckDB SQL (DuckDB 1.0 has no conv(); parse the
    hex digits positionally)."""
    assert 1 <= nchars <= 15
    terms = []
    for i in range(1, nchars + 1):
        power = 16 ** (nchars - i)
        terms.append(
            f"(strpos('0123456789abcdef', substr(md5(CAST({expr} AS VARCHAR)), {i}, 1)) - 1)"
            f" * CAST({power} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation (a*h + b) mod p for MinHash.

    a,b are fixed odd constants per hash function (seeded, engine-wide), so
    the oracle reproduces them literally. h must be < 2^32 (md5i(nchars=8))
    so a*h stays inside signed-64 without overflow for a < 2^29.
    """
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * {h_expr} + {b}) % {MERSENNE_P})"


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a,b) constants — no RNG at runtime, reproducible in
    SQL. a kept < 2^28 to avoid 64-bit overflow with 32-bit base hashes."""
    params = []
    a, b = seed * 2 + 1, seed * 31 + 7
    for _ in range(num_hashes):
        a = (a * 1_103_515_245 + 12_345) % (1 << 28) | 1
        b = (b * 69_069 + 1) % (1 << 30)
        params.append((a, b))
    return params
