"""Deterministic, oracle-able sketches: HyperLogLog (cardinality) and
Count-Min (frequency); Bloom membership lives with its query in
queries/text.py (q_decontaminate_bloom).

Spark's approx_count_distinct and DuckDB's approx sketches are different
algorithms with engine-private RNG/hash choices — useless for a value-hash
correctness gate. This module implements classic HyperLogLog (Flajolet,
Fusy, Gandouet, Meunier, AofA 2007) from portable primitives both engines
evaluate bit-identically:

  - the item hash is md5-derived (functions/hashes.md5i — RFC 1321 is the
    same everywhere), giving 60 deterministic bits per key;
  - bucket  = low B bits, rho = position of the highest set bit of the
    remaining 60-B bits (counted from the top, i.e. the classic
    leading-zero count + 1). rho is computed by an exact integer CASE
    ladder — no float log2 whose last-ulp behaviour could differ at
    power-of-two boundaries;
  - the per-bucket max(rho) aggregation is the ENTIRE shuffle: at 10^12
    rows the map-side combiner emits ≤ m rows per task (m = 2^B buckets),
    the canonical sketch property;
  - the harmonic-mean estimate folds the m registers IN BUCKET ORDER on
    both engines (sorted fold + an explicit term for empty buckets), so
    the float sum is IEEE-identical and even the ESTIMATE is value-checked
    by the DuckDB oracle — not just "within x%".

Standard HLL bias correction for the small-range regime is included
(linear counting when the raw estimate ≤ 2.5·m and empty buckets exist) —
same branch, same arithmetic, both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import hashes
from ..functions.geo import dlit

B_BITS = 6                 # 2^6 = 64 buckets
M_BUCKETS = 1 << B_BITS
HASH_CHARS = 15            # md5i nchars → 60 hash bits
VALUE_BITS = 60 - B_BITS   # bits feeding rho
# alpha_64 from the HLL paper (m >= 64): 0.709
ALPHA = 0.709


def bucket(key: Column) -> Column:
    return (hashes.md5i(key, HASH_CHARS) % F.lit(M_BUCKETS)).cast("int")


def bucket_sql(key: str) -> str:
    return f"CAST(({hashes.md5i_sql(key, HASH_CHARS)} % {M_BUCKETS}) AS INT)"


def rho(key: Column) -> Column:
    """1 + leading-zero count of the VALUE_BITS-wide value part — i.e. the
    smallest r with value >= 2^(VALUE_BITS - r); VALUE_BITS + 1 when the
    value part is 0. Exact integer thresholds, no float log."""
    # integer shift, NOT float division: the hash is 60-bit and doubles
    # lose integer precision above 2^53
    v = F.shiftright(hashes.md5i(key, HASH_CHARS), B_BITS)
    expr = None
    for r in range(1, VALUE_BITS + 1):
        threshold = 1 << (VALUE_BITS - r)
        cond = v >= F.lit(threshold)
        expr = F.when(cond, F.lit(r)) if expr is None else expr.when(
            cond, F.lit(r))
    return expr.otherwise(F.lit(VALUE_BITS + 1)).cast("int")


def rho_sql(key: str) -> str:
    v = f"(({hashes.md5i_sql(key, HASH_CHARS)}) >> {B_BITS})"
    branches = " ".join(
        f"WHEN {v} >= {1 << (VALUE_BITS - r)} THEN {r}"
        for r in range(1, VALUE_BITS + 1)
    )
    return f"CAST(CASE {branches} ELSE {VALUE_BITS + 1} END AS INT)"


def estimate_from_registers(regs: Column) -> Column:
    """regs: sorted array<struct<bucket:int, maxr:int>> of the PRESENT
    buckets. Returns floor(1e6 × HLL estimate) as long. Fold order: the
    present buckets ascending, then one closed-form term for the empties —
    identical on both engines."""
    m = F.lit(float(M_BUCKETS))
    present = F.size(regs)
    harm_present = F.aggregate(
        regs,
        F.lit(0.0),
        lambda acc, s: acc + F.lit(1.0) / F.pow(F.lit(2.0),
                                                s["maxr"].cast("double")),
    )
    harm = harm_present + (m - present.cast("double"))  # empty: 2^-0 = 1
    raw = F.lit(ALPHA) * m * m / harm
    zeros = m - present.cast("double")
    # linear-counting correction for the small range (HLL paper §4)
    lc = m * F.log(m / zeros)
    est = F.when((raw <= F.lit(2.5) * m) & (zeros > F.lit(0.0)), lc) \
        .otherwise(raw)
    return F.floor(est * F.lit(1.0e6)).cast("long")


def estimate_from_registers_sql(regs: str) -> str:
    m = dlit(float(M_BUCKETS))
    harm_present = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform({regs},"
        f" s -> {dlit(1.0)} / pow({dlit(2.0)}, CAST(s.maxr AS DOUBLE)))),"
        " (a, b) -> a + b)"
    )
    present = f"CAST(len({regs}) AS DOUBLE)"
    harm = f"({harm_present} + ({m} - {present}))"
    raw = f"({dlit(ALPHA)} * {m} * {m} / {harm})"
    zeros = f"({m} - {present})"
    lc = f"({m} * ln({m} / {zeros}))"
    est = (
        f"CASE WHEN {raw} <= {dlit(2.5)} * {m} AND {zeros} > {dlit(0.0)}"
        f" THEN {lc} ELSE {raw} END"
    )
    return f"CAST(floor({est} * {dlit(1.0e6)}) AS BIGINT)"


# --- Count-Min sketch (frequency) ---------------------------------------------
# Cormode & Muthukrishnan, J. Algorithms 2005. d=4 rows × w=1024 counters;
# est(key) = min over rows of counter[row][pos(row, key)] — an upper bound
# on the true count with overestimate ≤ 2N/w at ≥ 1-(1/2)^d probability.
# Same portability story as the HLL above: md5-salted positions, so the
# counter table and every estimate are bit-identical in DuckDB. The build
# shuffles ≤ d·w counter rows per map task (map-side partial sums), never
# the raw keys — frequency estimation at 10^12 rows for 32 KB of state.
CMS_D = 4
CMS_W = 1024


def cms_pos(key: Column, row: int) -> Column:
    return (hashes.md5i(F.concat(F.lit(f"c{row}:"), key.cast("string")), 12)
            % F.lit(CMS_W)).cast("int")


def cms_pos_sql(expr: str, row: int) -> str:
    h = hashes.md5i_sql(f"'c{row}:' || CAST({expr} AS VARCHAR)", 12)
    return f"CAST(({h}) % {CMS_W} AS INT)"
