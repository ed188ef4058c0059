"""Deduplication operators for the training-data pipeline — exact,
n-gram-Jaccard, MinHash+LSH, and SimHash near-dup detection over a
documents table. All shuffle-conscious:

  - exact:   one hash-groupBy (map-side partial agg, single shuffle)
  - jaccard: shingle-explode equi-join — candidates only where a shingle
             collides (never the N² cross product)
  - minhash: signatures in ONE groupBy (8 mins at once), then a band
             equi-join — the standard LSH bucket join; band keys are
             high-entropy so no salting needed
  - simhash: one explode + groupBy with 16 conditional sums

Everything is md5-derived (functions/hashes.py) so the DuckDB oracle
reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashes, text

NUM_HASHES = 8
BAND_R = 2  # rows per LSH band → 4 bands
SIMHASH_BITS = 16


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 prefix_words: int = 8) -> DataFrame:
    """Group documents by an md5 content key (first `prefix_words` words —
    catches boilerplate-prefix dups, degenerates to exact-text for short
    docs). Returns (fp, n_docs, keep_id): survivors = min id per group."""
    ws = text.words(F.col(text_col))
    key = F.concat_ws(" ", F.slice(ws, 1, prefix_words))
    return (
        df.withColumn("fp", F.md5(key))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_groups_sql(table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id", prefix_words: int = 8) -> str:
    ws = text.words_sql(text_col)
    key = f"array_to_string(list_slice({ws}, 1, {prefix_words}), ' ')"
    return (
        f"SELECT md5({key}) AS fp, count(*) AS n_docs,"
        f" min({id_col}) AS keep_id FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------
def _doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    from ..functions.barrier import eval_once

    # barrier: the shingle builder indexes the words array 3×/shingle —
    # inlining would re-split the document for every element_at
    w = eval_once(
        df.select(
            F.col(id_col).alias("doc"), text.words(F.col(text_col)).alias("ws")
        ),
        ["ws"],
    )
    return w.select(
        "doc", F.explode(text.shingles(F.col("ws"), k)).alias("sh")
    ).distinct()


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        min_inter: int = 2,
                        stop_df: int | None = None) -> DataFrame:
    """Candidate pairs sharing ≥ min_inter distinct word-k-grams, with the
    exact Jaccard similarity of their shingle sets.

    Plan: explode→distinct (one shuffle), self-equi-join on the shingle
    (shuffle hash join on a high-cardinality key), count-groupBy.

    stop_df is the 100-TB guard: a shingle appearing in > stop_df documents
    ("in the united states") would make its join key O(df²). With the guard
    on, shingle document frequencies are pre-aggregated and hot shingles
    are removed by a broadcast anti-join — the stop list is tiny by
    construction (only keys above the cutoff), so the anti-join never
    shuffles the shingle table. The filter applies BEFORE both the sizes
    aggregation and the self-join, so the semantics are exact Jaccard over
    the non-stop shingle vocabulary (mirrored identically in the oracle).
    """
    sh = _doc_shingles(df, text_col, id_col, k)
    if stop_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > F.lit(stop_df))
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("nsh"))
    a = sh.select(F.col("doc").alias("d1"), "sh")
    b = sh.select(F.col("doc").alias("d2"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
        .filter(F.col("inter") >= F.lit(min_inter))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "d1", "nsh": "n1"}), "d1")
        .join(sizes.withColumnsRenamed({"doc": "d2", "nsh": "n2"}), "d2")
        .select(
            "d1", "d2", "inter",
            # scaled floor, not round: jaccard is a small-denominator
            # rational — exact round-half ties diverge across engines
            F.floor(
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double")
                * F.lit(1.0e6)
            ).cast("long").alias("jaccard_e6"),
        )
    )


def ngram_jaccard_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      min_inter: int = 2,
                      stop_df: int | None = None) -> str:
    ws = text.words_sql(text_col)
    if stop_df is not None:
        sh_cte = (
            f"sh0 AS (SELECT DISTINCT doc,"
            f" unnest({text.shingles_sql('ws', k)}) AS sh FROM w), "
            f"hot AS (SELECT sh FROM sh0 GROUP BY 1"
            f" HAVING count(*) > {stop_df}), "
            "sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)), "
        )
    else:
        sh_cte = (
            f"sh AS (SELECT DISTINCT doc,"
            f" unnest({text.shingles_sql('ws', k)}) AS sh FROM w), "
        )
    return (
        f"WITH w AS (SELECT {id_col} AS doc, {ws} AS ws FROM {table}), "
        + sh_cte +
        "sizes AS (SELECT doc, count(*) AS nsh FROM sh GROUP BY 1), "
        "inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS inter"
        " FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc"
        f" GROUP BY 1, 2 HAVING count(*) >= {min_inter}) "
        "SELECT d1, d2, inter, CAST(floor(CAST(inter AS DOUBLE)"
        " / CAST(s1.nsh + s2.nsh - inter AS DOUBLE) * 1.0e6) AS BIGINT)"
        " AS jaccard_e6"
        " FROM inter JOIN sizes s1 ON d1 = s1.doc JOIN sizes s2 ON d2 = s2.doc"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc, s0..s{n-1}) — all minima in ONE aggregation (single shuffle)."""
    from ..functions.barrier import eval_once

    sh = _doc_shingles(df, text_col, id_col, k)
    # barrier: all 8 permutations reference the same base md5 hash — without
    # it Catalyst inlines the md5 into each min() and computes it 8×/row
    sh = eval_once(sh.withColumn("h", hashes.md5i(F.col("sh"), 8)), ["h"])
    aggs = [
        F.min(hashes.minhash_perm(F.col("h"), a, b)).alias(f"s{i}")
        for i, (a, b) in enumerate(hashes.minhash_params(num_hashes))
    ]
    return sh.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, num_hashes: int = NUM_HASHES,
                        band_r: int = BAND_R) -> DataFrame:
    """Band the signature (r rows per band) and equi-join on band keys —
    pairs agreeing on ≥1 full band. Distinct (d1, d2) output."""
    n_bands = num_hashes // band_r
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[F.col(f"s{b * band_r + r}").cast("string") for r in range(band_r)],
            )
            for b in range(n_bands)
        ]
    )
    e = sigs.select(F.col("doc"), F.explode(bands).alias("bk"))
    a = e.select(F.col("doc").alias("d1"), "bk")
    b = e.select(F.col("doc").alias("d2"), "bk")
    # shuffle_hash: band keys are high-cardinality equi-keys with no useful
    # ordering — SMJ (Spark's default when neither side broadcasts) pays two
    # full sorts of the exploded band stream for nothing a hash table
    # doesn't give; at 10^12 rows those sorts are the stage's entire cost
    return (
        a.join(b.hint("shuffle_hash"), "bk")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_lsh_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    num_hashes: int = NUM_HASHES, band_r: int = BAND_R) -> str:
    ws = text.words_sql(text_col)
    params = hashes.minhash_params(num_hashes)
    mins = ", ".join(
        f"min({hashes.minhash_perm_sql(hashes.md5i_sql('sh'), a, b)}) AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    n_bands = num_hashes // band_r
    band_keys = ", ".join(
        "'" + str(b) + ":' || "
        + " || ':' || ".join(
            f"CAST(s{b * band_r + r} AS VARCHAR)" for r in range(band_r)
        )
        for b in range(n_bands)
    )
    return (
        f"WITH w AS (SELECT {id_col} AS doc, {ws} AS ws FROM {table}), "
        f"sh AS (SELECT DISTINCT doc, unnest({text.shingles_sql('ws', k)}) AS sh"
        " FROM w), "
        f"sigs AS (SELECT doc, {mins} FROM sh GROUP BY 1), "
        f"bands AS (SELECT doc, unnest([{band_keys}]) AS bk FROM sigs) "
        "SELECT DISTINCT a.doc AS d1, b.doc AS d2 FROM bands a"
        " JOIN bands b ON a.bk = b.bk AND a.doc < b.doc"
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (phash) near-dup
# ---------------------------------------------------------------------------
PHASH_BITS = 64


def phash_band_keys(ph: Column, n_bands: int) -> Column:
    """The banded hamming-LSH key array: n_bands disjoint chunks of the
    64-bit hash, each offset by its band index so identical chunk VALUES in
    different bands never collide. Shared by the batch pair join and the
    streaming seen-bucket table."""
    assert PHASH_BITS % n_bands == 0, "bands must tile the 64-bit hash"
    bb = PHASH_BITS // n_bands
    mask = (1 << bb) - 1
    return F.array(
        *[
            F.shiftright(ph, b * bb).bitwiseAND(F.lit(mask))
            + F.lit(b << bb)
            for b in range(n_bands)
        ]
    )


def phash_near_dup(df: DataFrame, phash_col: str = "phash",
                   id_col: str = "doc_id",
                   max_hamming: int = 3,
                   n_bands: int | None = None) -> DataFrame:
    """Image near-dup pairs by perceptual-hash hamming distance ≤ k — the
    first dedup pass of an image training-data pipeline (the input contract
    ships phash:int64 per BASELINE.json input_hint).

    Banded, never all-pairs: split the 64-bit hash into n_bands disjoint
    chunks and equi-join on (band, chunk) keys. With n_bands = k+1 the
    pigeonhole principle makes recall EXACT (two hashes within hamming k
    differ in ≤ k chunks, so they agree on ≥ 1 of the k+1 chunks) — this is
    a guaranteed-complete result, not an approximation. Refine is native
    bit_count(x ^ y) (JVM codegen; no Python). At 10^12 rows each band key
    space is 2^16 buckets × n_bands, and only same-chunk rows ever meet.

    Arithmetic shiftright + mask extracts chunks correctly for NEGATIVE
    int64 phashes too (a real 64-bit phash stored as signed). Returns
    distinct (d1, d2, hamming) with d1 < d2.
    """
    n_bands = n_bands if n_bands is not None else max_hamming + 1
    ph = F.col(phash_col)
    bands = phash_band_keys(ph, n_bands)
    e = df.select(
        F.col(id_col).alias("doc"), ph.alias("ph"), F.explode(bands).alias("bk")
    )
    a = e.select(F.col("doc").alias("d1"), F.col("ph").alias("ph1"), "bk")
    b = e.select(F.col("doc").alias("d2"), F.col("ph").alias("ph2"), "bk")
    # shuffle_hash for the same reason as lsh_candidate_pairs: the band-key
    # equi-join gains nothing from SMJ's two sorts
    return (
        a.join(b.hint("shuffle_hash"), "bk")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1", "d2",
            F.bit_count(F.col("ph1").bitwiseXOR(F.col("ph2")))
            .cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()  # a pair may collide in several bands; dedup AFTER the
                     # hamming filter so only true pairs reach the shuffle
    )


def phash_near_dup_sql(table: str, phash_expr: str, id_col: str = "doc_id",
                       max_hamming: int = 3,
                       n_bands: int | None = None) -> str:
    """DuckDB mirror. phash_expr must be NON-NEGATIVE (< 2^63): DuckDB's
    `&` on negative BIGINTs diverges from two's-complement masking, so the
    oracle contract is positive hashes only (the engine side has no such
    restriction)."""
    n_bands = n_bands if n_bands is not None else max_hamming + 1
    bb = PHASH_BITS // n_bands
    mask = (1 << bb) - 1
    keys = ", ".join(
        f"(((ph >> {b * bb}) & {mask}) + {b << bb})" for b in range(n_bands)
    )
    return (
        f"WITH e AS (SELECT {id_col} AS doc, {phash_expr} AS ph FROM {table}), "
        f"bands AS (SELECT doc, ph, unnest([{keys}]) AS bk FROM e) "
        "SELECT DISTINCT a.doc AS d1, b.doc AS d2,"
        " CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming"
        " FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc < b.doc"
        f" WHERE bit_count(xor(a.ph, b.ph)) <= {max_hamming}"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over token 16-bit md5 hashes: bit i of the signature
    is the sign of sum(±1) over tokens. One explode + one groupBy."""
    from ..functions.barrier import eval_once

    tok = eval_once(
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(text.words(F.col(text_col))).alias("w"),
        ).withColumn("h", hashes.md5i(F.col("w"), bits // 4)),
        ["h"],
    )
    bit_sums = [
        F.sum(
            F.when((F.col("h") % F.lit(1 << (i + 1))) >= F.lit(1 << i), F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"c{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    sig: Column = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"c{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return agg.select("doc", sig.alias("simhash"))


def simhash_sql(table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> str:
    ws = text.words_sql(text_col)
    h = hashes.md5i_sql("w", bits // 4)
    sums = ", ".join(
        f"sum(CASE WHEN ({h}) % {1 << (i + 1)} >= {1 << i} THEN 1 ELSE -1 END)"
        f" AS c{i}"
        for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return (
        f"WITH tok AS (SELECT {id_col} AS doc, unnest({ws}) AS w FROM {table}), "
        f"agg AS (SELECT doc, {sums} FROM tok GROUP BY 1) "
        f"SELECT doc, {sig} AS simhash FROM agg"
    )
