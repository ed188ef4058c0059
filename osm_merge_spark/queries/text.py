"""Training-data text queries over the documents table: dedup family +
text analysis. Engine side calls operators/dedup.py and functions/text.py;
oracles come from the same modules' SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text
from ..operators import dedup


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- exact dedup -------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_groups(_docs(spark, sf_dir))


# -- n-gram Jaccard ----------------------------------------------------------
# stop_df ON in the headline query: shingles in >100 docs are dropped before
# the self-join (the hot-shingle O(df²) guard), mirrored in the oracle.
NGRAM_STOP_DF = 100


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir),
                                     stop_df=NGRAM_STOP_DF)


# -- perceptual-hash near-dup ------------------------------------------------
# The driver's testdata ships no image table, so the oracle derives a
# deterministic stand-in phash per document: a 60-bit md5 of the 8-word
# prefix (documents sharing boilerplate prefixes = "near-identical images")
# XOR a 0-3-low-bit perturbation keyed on doc_id — planting true hamming≤3
# near-dup pairs exactly where exact-dedup groups exist. Positive by
# construction (DuckDB's & diverges on negative BIGINTs; engine side has no
# such restriction — see phash_near_dup_sql). In production this column IS
# the input_hint's phash:int64 on the image table.
from ..functions import hashes  # noqa: E402


def _derived_phash_col() -> F.Column:
    ws = text.words(F.col("text"))
    key = F.concat_ws(" ", F.slice(ws, 1, 8))
    pert = F.expr("shiftleft(1L, CAST(doc_id % 4 AS INT)) - 1L")
    return hashes.md5i(key, 15).bitwiseXOR(pert)


def _derived_phash_sql() -> str:
    ws = text.words_sql("text")
    key = f"array_to_string(list_slice({ws}, 1, 8), ' ')"
    return f"xor({hashes.md5i_sql(key, 15)}, (1 << (doc_id % 4)) - 1)"


def q_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("phash", _derived_phash_col())
    return dedup.phash_near_dup(docs)


# -- near-dup cluster assignment (connected components) ----------------------
# Pairs alone can't drive a dedup pass (A~B, B~C keeps two of three); label
# every document with its component's min id and keep one representative.
# Runs over the phash pair graph — the image-pipeline first pass.
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    docs = _docs(spark, sf_dir)
    pairs = dedup.phash_near_dup(docs.withColumn("phash", _derived_phash_col()))
    cc = connected_components(pairs)
    return docs.join(cc, docs["doc_id"] == cc["doc"], "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        F.when(
            F.coalesce(F.col("cluster_id"), F.col("doc_id")) == F.col("doc_id"),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("int").alias("keep"),
    )


def _sql_dedup_cluster() -> str:
    from ..operators.components import cluster_assign_sql

    return cluster_assign_sql(
        dedup.phash_near_dup_sql("documents", _derived_phash_sql())
    )


# -- cluster representative by quality ----------------------------------------
# dedup_cluster keeps the min-id member — fine for counting, wrong for a
# training corpus, where you keep the HIGHEST-QUALITY copy of each near-dup
# family (the keep-best rule of CCNet/RefinedWeb-style dedup stages; the
# reference's conflation analog is "best candidate wins", conflator.py). Rank
# key is the integer-floored quality score (same e6 trick as text_quality, so
# both engines compare identical longs); ties break to the smaller doc_id via
# the struct's negated second field. Plan: the cluster shuffle plus ONE
# groupBy on cluster_id — max(struct) aggregates partially map-side, no
# window, no sort; at 10^12 docs this is the same cost as dedup_cluster.
def _doc_quality_e6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, q_e6): floor(1e6 × quality_score), 0 for empty documents."""
    from ..functions.barrier import eval_once

    df = eval_once(
        _docs(spark, sf_dir).withColumn("ws", text.words(F.col("text"))), ["ws"]
    )
    ws = F.col("ws")
    nw = F.size(ws)
    char_sum = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    avg_len = char_sum.cast("double") / nw.cast("double")
    stop_ratio = text.stop_count(ws).cast("double") / nw.cast("double")
    q_e6 = (
        F.when(
            nw > 0,
            F.floor(text.quality_score(nw, avg_len, stop_ratio) * F.lit(1.0e6)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return df.select("doc_id", q_e6.alias("q_e6"))


def _quality_e6_sql() -> str:
    ws = text.words_sql("text")
    nw = f"len({ws})"
    char_sum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({ws}, w -> CAST(length(w) AS BIGINT))), (a, b) -> a + b)"
    )
    avg_len = f"(CAST({char_sum} AS DOUBLE) / CAST({nw} AS DOUBLE))"
    stop_ratio = f"(CAST({text.stop_count_sql(ws)} AS DOUBLE) / CAST({nw} AS DOUBLE))"
    q = text.quality_score_sql(nw, avg_len, stop_ratio)
    return (
        f"CASE WHEN {nw} > 0 THEN CAST(floor({q} * 1.0e6) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    docs = _docs(spark, sf_dir)
    pairs = dedup.phash_near_dup(docs.withColumn("phash", _derived_phash_col()))
    cc = connected_components(pairs)
    scored = _doc_quality_e6(spark, sf_dir)
    member = scored.join(cc, scored["doc_id"] == cc["doc"], "left").select(
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        "doc_id",
        "q_e6",
    )
    best = F.max(F.struct(F.col("q_e6"), (-F.col("doc_id")).alias("nd"))).alias("m")
    return (
        member.groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"), best)
        .select(
            "cluster_id",
            F.col("m.q_e6").alias("best_quality_e6"),
            (-F.col("m.nd")).alias("keep_doc_id"),
            "n_members",
        )
    )


def _sql_dedup_keep_best() -> str:
    best = "max(struct_pack(q_e6 := q_e6, nd := -doc_id))"
    return (
        f"WITH scored AS (SELECT doc_id, {_quality_e6_sql()} AS q_e6"
        " FROM documents), "
        "member AS (SELECT a.cluster_id, s.doc_id, s.q_e6 FROM scored s"
        f" JOIN ({_sql_dedup_cluster()}) a USING (doc_id)) "
        "SELECT cluster_id,"
        f" ({best}).q_e6 AS best_quality_e6,"
        f" -(({best}).nd) AS keep_doc_id,"
        " count(*) AS n_members"
        " FROM member GROUP BY cluster_id"
    )


# -- leakage-free train/val/test split ---------------------------------------
# A per-document random split leaks: a near-dup pair straddling train and val
# inflates eval (the canonical mistake documented by Lee et al.,
# "Deduplicating Training Data Makes Language Models Better" — eval overlap
# from duplicates). Split by the CLUSTER id, not the doc id: hash-threshold
# on md5(cluster_id) sends every whole near-dup family to one split.
# Deterministic (no RNG state, reproducible across runs and engines), and a
# pure projection on top of the cluster labels — the split adds zero
# shuffles beyond the cluster job itself.
SPLIT_VAL_PCT = 5
SPLIT_TEST_PCT = 5


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import hashes

    cl = q_dedup_cluster(spark, sf_dir)
    slot = hashes.md5i(F.col("cluster_id"), 8) % 100
    split = (
        F.when(slot < SPLIT_VAL_PCT, F.lit("val"))
        .when(slot < SPLIT_VAL_PCT + SPLIT_TEST_PCT, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return cl.select("doc_id", "cluster_id", split.alias("split"))


def _sql_cluster_split() -> str:
    from ..functions import hashes

    slot = f"({hashes.md5i_sql('cluster_id', 8)} % 100)"
    return (
        "SELECT doc_id, cluster_id,"
        f" CASE WHEN {slot} < {SPLIT_VAL_PCT} THEN 'val'"
        f" WHEN {slot} < {SPLIT_VAL_PCT + SPLIT_TEST_PCT} THEN 'test'"
        " ELSE 'train' END AS split"
        f" FROM ({_sql_dedup_cluster()}) a"
    )


# -- benchmark decontamination -----------------------------------------------
# The standard train/eval overlap check (GPT-3 appendix C / The Pile): flag
# every training document sharing at least one word 4-gram with any document
# of the (small) eval set. Eval shingles broadcast — the train shingle stream
# never shuffles for the membership probe; at 100 TB the broadcast set can be
# swapped for a Bloom filter with identical plan shape. Eval set here =
# doc_id % 37 == 0 (deterministic stand-in for a held-out benchmark).
DECON_K = 4
DECON_MOD = 37


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    is_eval = F.col("doc_id") % DECON_MOD == 0
    ev_sh = (
        dedup._doc_shingles(docs.filter(is_eval), "text", "doc_id", DECON_K)
        .select("sh").distinct()
    )
    tr_sh = dedup._doc_shingles(docs.filter(~is_eval), "text", "doc_id", DECON_K)
    return (
        tr_sh.join(F.broadcast(ev_sh), "sh")
        .groupBy("doc")
        .agg(F.count("*").alias("n_hits"))  # tr_sh is distinct per (doc, sh)
        .select(F.col("doc").alias("doc_id"), "n_hits")
    )


def _sql_decontaminate() -> str:
    ws = text.words_sql("text")
    grams = text.shingles_sql("w", DECON_K)
    return (
        f"WITH ws AS (SELECT doc_id, {ws} AS w FROM documents), "
        f"sh AS (SELECT DISTINCT doc_id, unnest({grams}) AS sh FROM ws), "
        f"ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {DECON_MOD} = 0) "
        "SELECT s.doc_id, count(*) AS n_hits FROM sh s JOIN ev USING (sh) "
        f"WHERE s.doc_id % {DECON_MOD} != 0 GROUP BY s.doc_id"
    )


# -- Bloom-filter decontamination ----------------------------------------------
# q_decontaminate broadcasts the distinct eval shingles — exact, but at a
# 10^9-shingle eval corpus the broadcast is gigabytes. The classic swap is a
# Bloom filter: k=7 md5-salted positions in an m=2^14-bit space; a train
# shingle is flagged when ALL k of its positions are set. Implemented
# relationally (positions-present join + count==k) so the FP semantics are
# EXACTLY a Bloom filter with this hash family while both engines stay in
# hash joins — the position set is ≤ m rows no matter how large the eval
# corpus grows, which is the entire point. False positives are deterministic
# (same hashes both engines), so even they are value-checked by the oracle.
# Fill here ≈ 24% → FP rate ≈ 0.24^7 ≈ 5e-5.
BLOOM_K = 7
BLOOM_M = 1 << 14


def _bloom_pos(col: F.Column, salt: int) -> F.Column:
    from ..functions import hashes

    return (hashes.md5i(F.concat(F.lit(f"b{salt}:"), col), 12)
            % F.lit(BLOOM_M)).cast("int")


def _bloom_pos_sql(expr: str, salt: int) -> str:
    from ..functions import hashes

    h = hashes.md5i_sql(f"'b{salt}:' || {expr}", 12)
    return f"CAST(({h}) % {BLOOM_M} AS INT)"


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    is_eval = F.col("doc_id") % DECON_MOD == 0
    ev_sh = (
        dedup._doc_shingles(docs.filter(is_eval), "text", "doc_id", DECON_K)
        .select("sh").distinct()
    )
    positions = (
        ev_sh.select(
            F.explode(F.array(*[
                _bloom_pos(F.col("sh"), s) for s in range(BLOOM_K)
            ])).alias("pos")
        ).distinct()
    )
    tr_sh = dedup._doc_shingles(docs.filter(~is_eval), "text", "doc_id",
                                DECON_K)
    tr_pos = tr_sh.select(
        "doc", "sh",
        F.posexplode(F.array(*[
            _bloom_pos(F.col("sh"), s) for s in range(BLOOM_K)
        ])).alias("k", "pos"),
    )
    flagged = (
        tr_pos.join(F.broadcast(positions), "pos")
        .groupBy("doc", "sh")
        .agg(F.count("*").alias("k_hits"))
        .filter(F.col("k_hits") == BLOOM_K)
    )
    return (
        flagged.groupBy("doc")
        .agg(F.count("*").alias("n_flagged"))
        .select(F.col("doc").alias("doc_id"), "n_flagged")
    )


def _sql_decontaminate_bloom() -> str:
    ws = text.words_sql("text")
    grams = text.shingles_sql("w", DECON_K)
    ev_positions = " UNION ".join(
        f"SELECT DISTINCT {_bloom_pos_sql('sh', s)} AS pos FROM ev"
        for s in range(BLOOM_K)
    )
    tr_pos = " UNION ALL ".join(
        f"SELECT doc_id, sh, {_bloom_pos_sql('sh', s)} AS pos FROM tr"
        for s in range(BLOOM_K)
    )
    return (
        f"WITH wsx AS (SELECT doc_id, {ws} AS w FROM documents), "
        f"shx AS (SELECT DISTINCT doc_id, unnest({grams}) AS sh FROM wsx), "
        f"ev AS (SELECT DISTINCT sh FROM shx WHERE doc_id % {DECON_MOD} = 0), "
        f"tr AS (SELECT doc_id, sh FROM shx WHERE doc_id % {DECON_MOD} != 0), "
        f"pset AS (SELECT DISTINCT pos FROM ({ev_positions}) p), "
        f"tp AS ({tr_pos}), "
        "fl AS (SELECT doc_id, sh, count(*) AS k_hits FROM tp"
        " JOIN pset USING (pos) GROUP BY doc_id, sh) "
        "SELECT doc_id, count(*) AS n_flagged FROM fl"
        f" WHERE k_hits = {BLOOM_K} GROUP BY doc_id"
    )


# -- deterministic stratified sampling ---------------------------------------
# Per-language downsampling at fixed rates (the data-mixing step of corpus
# assembly). Hash-threshold on md5 of the id: deterministic, reproducible,
# no RNG state, embarrassingly parallel (pure filter — no shuffle, no
# sort-based sampling), and exactly mirrorable in SQL. Rates in permille.
SAMPLE_RATES = {"en": 400, "de": 800, "fr": 800, "es": 800, "zh": 800}
SAMPLE_DEFAULT = 1000


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    rate = F.lit(SAMPLE_DEFAULT)
    for lang, permille in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    bucket = hashes.md5i(F.col("doc_id"), 8) % 1000
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


def _sql_sample_stratified() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {permille}"
        for lang, permille in sorted(SAMPLE_RATES.items())
    )
    bucket = f"({hashes.md5i_sql('doc_id', 8)} % 1000)"
    return (
        "SELECT doc_id, lang, source FROM documents "
        f"WHERE {bucket} < (CASE {cases} ELSE {SAMPLE_DEFAULT} END)"
    )


# -- MinHash + LSH -----------------------------------------------------------
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir))
    return dedup.lsh_candidate_pairs(sigs)


# -- SimHash -----------------------------------------------------------------
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


# -- text quality ------------------------------------------------------------
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.barrier import eval_once

    df = eval_once(
        _docs(spark, sf_dir).withColumn("ws", text.words(F.col("text"))), ["ws"]
    )
    ws = F.col("ws")
    nw = F.size(ws)
    char_sum = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    avg_len = char_sum.cast("double") / nw.cast("double")
    stop_ratio = text.stop_count(ws).cast("double") / nw.cast("double")
    # outputs are small-denominator rationals → exact round-half boundaries
    # are reachable and Spark/DuckDB tie rules differ. floor of the
    # (bit-identical) scaled double is deterministic in both engines.
    return df.filter(nw > 0).select(
        "doc_id",
        nw.alias("n_words"),
        F.floor(avg_len * F.lit(1.0e6)).cast("long").alias("avg_len_e6"),
        F.floor(stop_ratio * F.lit(1.0e6)).cast("long").alias("stop_ratio_e6"),
        F.floor(
            text.quality_score(nw, avg_len, stop_ratio) * F.lit(1.0e6)
        ).cast("long").alias("quality_e6"),
    )


def _sql_text_quality() -> str:
    ws = text.words_sql("text")
    nw = f"len({ws})"
    char_sum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({ws}, w -> CAST(length(w) AS BIGINT))), (a, b) -> a + b)"
    )
    avg_len = f"(CAST({char_sum} AS DOUBLE) / CAST({nw} AS DOUBLE))"
    stop_ratio = f"(CAST({text.stop_count_sql(ws)} AS DOUBLE) / CAST({nw} AS DOUBLE))"
    q = text.quality_score_sql(nw, avg_len, stop_ratio)
    e6 = "1.0e6"
    return (
        f"SELECT doc_id, CAST({nw} AS INT) AS n_words,"
        f" CAST(floor({avg_len} * {e6}) AS BIGINT) AS avg_len_e6,"
        f" CAST(floor({stop_ratio} * {e6}) AS BIGINT) AS stop_ratio_e6,"
        f" CAST(floor({q} * {e6}) AS BIGINT) AS quality_e6"
        f" FROM documents WHERE {nw} > 0"
    )


# -- language ID -------------------------------------------------------------
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.barrier import eval_once

    df = eval_once(
        _docs(spark, sf_dir).withColumn("ws", text.words(F.col("text"))), ["ws"]
    )
    return df.select("doc_id", text.lang_pred(F.col("ws")).alias("pred_lang"))


def _sql_lang_id() -> str:
    ws = text.words_sql("text")
    return (
        f"SELECT doc_id, {text.lang_pred_sql(ws)} AS pred_lang FROM documents"
    )


# -- token counting ----------------------------------------------------------
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def _sql_token_count() -> str:
    return (
        f"SELECT doc_id, CAST({text.token_count_sql('text')} AS INT) AS n_tokens,"
        " CAST(length(text) AS INT) AS n_chars_actual FROM documents"
    )


# -- repetition stats (Gopher-style quality filters) -------------------------
# Two of the Gopher/MassiveText repetition signals per document: the
# duplicate-word fraction (1 - distinct/total) and the fraction of all word
# bigrams taken by the single most frequent bigram. Plan: one shuffle-free
# projection for the word stats + explode→two-level groupBy for the top
# bigram (partial aggregation map-side; the (doc, gram) key is high-entropy
# so no salting needed at 100 TB). Fractions floor-scaled to e6 ints — the
# same determinism trick as text_quality (Spark/DuckDB round-half ties).
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.barrier import eval_once

    df = eval_once(
        _docs(spark, sf_dir).withColumn("ws", text.words(F.col("text"))), ["ws"]
    )
    ws = F.col("ws")
    nw = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    st = df.filter(nw > 0).select(
        "doc_id",
        nw.alias("n_words"),
        F.floor(
            (nw - nd).cast("double") / nw.cast("double") * F.lit(1.0e6)
        ).cast("long").alias("dup_word_frac_e6"),
    )
    gt = (
        df.select("doc_id", F.explode(text.shingles(ws, 2)).alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top"), F.sum("c").alias("tot"))
    )
    return st.join(gt, "doc_id", "left").select(
        "doc_id", "n_words", "dup_word_frac_e6",
        F.coalesce(
            F.floor(
                F.col("top").cast("double") / F.col("tot").cast("double")
                * F.lit(1.0e6)
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("top_bigram_frac_e6"),
    )


def _sql_repetition_stats() -> str:
    ws = text.words_sql("text")
    grams = text.shingles_sql("w", 2)
    return (
        f"WITH ws AS (SELECT doc_id, {ws} AS w FROM documents), "
        "st AS (SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS nd"
        " FROM ws WHERE len(w) > 0), "
        f"g AS (SELECT doc_id, unnest({grams}) AS g FROM ws), "
        "gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2), "
        "gt AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM gc GROUP BY 1) "
        "SELECT st.doc_id, CAST(nw AS INT) AS n_words,"
        " CAST(floor(CAST(nw - nd AS DOUBLE) / CAST(nw AS DOUBLE) * 1.0e6)"
        " AS BIGINT) AS dup_word_frac_e6,"
        " coalesce(CAST(floor(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE)"
        " * 1.0e6) AS BIGINT), 0) AS top_bigram_frac_e6"
        " FROM st LEFT JOIN gt ON st.doc_id = gt.doc_id"
    )


# -- composite corpus filter (C4-style keep/drop with reasons) ---------------
# The assembly step that consumes the individual signals: every document
# gets a keep verdict plus the list of firing drop-reasons (C4 / RefinedWeb
# style). One narrow projection, no shuffle, embarrassingly parallel. All
# predicates are INTEGER arithmetic (dup-fraction > 0.6 tested as
# (nw-nd)*10 > 6*nw) so no float-boundary divergence between engines.
FILTER_MIN_WORDS = 20
FILTER_LANGS = ("de", "en", "es", "fr")  # allowlist; zh dropped in this cfg


def corpus_filter_df(docs: DataFrame) -> DataFrame:
    """The filter as a pure projection over (doc_id, text, lang) — shared
    verbatim by the batch query and the streaming twin
    (streaming/jobs.corpus_filter_stream): stateless, so the micro-batch
    result is identical to batch by construction (proven by test)."""
    from ..functions.barrier import eval_once

    df = eval_once(
        docs.withColumn("ws", text.words(F.col("text"))), ["ws"]
    )
    nw = F.size("ws")
    nd = F.size(F.array_distinct("ws"))
    reasons = F.array_compact(
        F.array(
            F.when(nw < FILTER_MIN_WORDS, F.lit("too_short")),
            F.when((nw - nd) * 10 > nw * 6, F.lit("repetitive")),
            F.when(~F.col("lang").isin(*FILTER_LANGS), F.lit("lang")),
        )
    )
    return df.select(
        "doc_id",
        F.concat_ws(",", reasons).alias("drop_reasons"),
        (F.size(reasons) == 0).cast("int").alias("keep"),
    )


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_filter_df(_docs(spark, sf_dir))


def _sql_corpus_filter() -> str:
    ws = text.words_sql("text")
    langs = ", ".join(f"'{x}'" for x in FILTER_LANGS)
    return (
        f"WITH t AS (SELECT doc_id, lang, len({ws}) AS nw,"
        f" len(list_distinct({ws})) AS nd FROM documents) "
        "SELECT doc_id, coalesce(array_to_string(list_filter(["
        f" CASE WHEN nw < {FILTER_MIN_WORDS} THEN 'too_short' END,"
        " CASE WHEN (nw - nd) * 10 > nw * 6 THEN 'repetitive' END,"
        f" CASE WHEN lang NOT IN ({langs}) THEN 'lang' END],"
        " x -> x IS NOT NULL), ','), '') AS drop_reasons,"
        f" CAST(CASE WHEN nw >= {FILTER_MIN_WORDS}"
        " AND (nw - nd) * 10 <= nw * 6"
        f" AND lang IN ({langs}) THEN 1 ELSE 0 END AS INT) AS keep"
        " FROM t"
    )


# -- rolling-hash fingerprint ------------------------------------------------
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id", text.rolling_fingerprint(F.col("text")).alias("fp")
    )


def _sql_doc_fingerprint() -> str:
    return (
        f"SELECT doc_id, {text.rolling_fingerprint_sql('text')} AS fp"
        " FROM documents"
    )


# -- corpus assembly capstone ------------------------------------------------
# The whole pipeline as ONE lazy plan: keep a document iff (a) it passes
# the composite quality filter, (b) it is its near-dup cluster's
# representative (phash connected components), and (c) it survives the
# per-language stratified sample. Spark fuses the three predicates into a
# single DAG — the filter is a projection, the sample a filter, and only
# the cluster step shuffles; at 10^12 docs the assembly costs exactly the
# dedup-cluster job plus free pushdown.
def q_corpus_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    filt = q_corpus_filter(spark, sf_dir).filter(F.col("keep") == 1)
    keepers = q_dedup_cluster(spark, sf_dir).filter(F.col("keep") == 1)
    sampled = q_sample_stratified(spark, sf_dir)
    return (
        sampled
        .join(filt.select("doc_id").hint("shuffle_hash"), "doc_id",
              "left_semi")
        .join(keepers.select("doc_id").hint("shuffle_hash"), "doc_id",
              "left_semi")
        .select("doc_id", "lang", "source")
    )


def _sql_corpus_assemble() -> str:
    return (
        f"SELECT doc_id, lang, source FROM ({_sql_sample_stratified()}) s"
        f" WHERE doc_id IN (SELECT doc_id FROM ({_sql_corpus_filter()}) f"
        "   WHERE keep = 1)"
        f" AND doc_id IN (SELECT doc_id FROM ({_sql_dedup_cluster()}) c"
        "   WHERE keep = 1)"
    )


QUERIES = {
    "dedup_exact": (q_dedup_exact, dedup.exact_groups_sql()),
    "dedup_ngram": (q_dedup_ngram, dedup.ngram_jaccard_sql(stop_df=NGRAM_STOP_DF)),
    "dedup_minhash_pairs": (q_dedup_minhash_pairs, dedup.minhash_lsh_sql()),
    "dedup_phash": (
        q_dedup_phash,
        dedup.phash_near_dup_sql("documents", _derived_phash_sql()),
    ),
    "dedup_simhash": (q_dedup_simhash, dedup.simhash_sql()),
    "dedup_cluster": (q_dedup_cluster, _sql_dedup_cluster()),
    "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "cluster_split": (q_cluster_split, _sql_cluster_split()),
    "decontaminate": (q_decontaminate, _sql_decontaminate()),
    "decontaminate_bloom": (q_decontaminate_bloom, _sql_decontaminate_bloom()),
    "sample_stratified": (q_sample_stratified, _sql_sample_stratified()),
    "repetition_stats": (q_repetition_stats, _sql_repetition_stats()),
    "corpus_filter": (q_corpus_filter, _sql_corpus_filter()),
    "corpus_assemble": (q_corpus_assemble, _sql_corpus_assemble()),
    "text_quality": (q_text_quality, _sql_text_quality()),
    "lang_id": (q_lang_id, _sql_lang_id()),
    "token_count": (q_token_count, _sql_token_count()),
    "doc_fingerprint": (q_doc_fingerprint, _sql_doc_fingerprint()),
}


# -- corpus mixture rebalancing -----------------------------------------------
# The pretraining data-mixing step (fixed-mixture flavor of DoReMi/Pile
# recipes): given TARGET per-source weights, compute per-source sampling
# rates so the sampled corpus hits the target mixture under a global token
# budget (MIX_ALPHA of the corpus), then sample deterministically by doc-id
# hash. Unlike sample_stratified (fixed literal rates), the rates here are
# DATA-DERIVED — two aggregate passes (per-source token sums; the Σw/Σtokens
# scalars) produce a ≤|sources|-row rate table that broadcasts back onto the
# corpus: the full scan never shuffles, exactly the lm_quality vocab shape.
# All rate arithmetic lands in integer per-million units before the compare,
# so keep/drop is reproducible and engine-exact.
MIX_ALPHA = 0.5  # sampled corpus targets half the corpus tokens


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source",
        text.token_count(F.col("text")).cast("long").alias("n_tok"),
        F.expr("substring(source, 4)").cast("long").alias("src_num"),
    )
    per_src = docs.groupBy("source", "src_num").agg(
        F.sum("n_tok").alias("tokens_s")
    ).withColumn("w_s", F.lit(1) + (F.col("src_num") % 3).cast("long"))
    tot = per_src.agg(
        F.sum("w_s").alias("sw"), F.sum("tokens_s").alias("tt")
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(
                (F.col("w_s").cast("double")
                 * F.floor(F.lit(5.0e-1) * F.col("tt").cast("double")))
                / (F.col("sw").cast("double") * F.col("tokens_s").cast("double"))
                * F.lit(1.0e6)
            ).cast("long"),
        ).alias("rate_pm"),
    )
    bucket = hashes.md5i(F.col("doc_id"), 8) % F.lit(1_000_000)
    return docs.join(F.broadcast(rates), "source").select(
        "doc_id", "source", "rate_pm",
        (bucket < F.col("rate_pm")).alias("keep"),
    )


def _sql_corpus_mixture() -> str:
    ntok = text.token_count_sql("text")
    bucket = f"({hashes.md5i_sql('doc_id', 8)} % 1000000)"
    return (
        f"WITH d AS (SELECT doc_id, source, CAST({ntok} AS BIGINT) AS n_tok,"
        " CAST(substr(source, 4) AS BIGINT) AS src_num FROM documents), "
        "ps AS (SELECT source, src_num, CAST(sum(n_tok) AS BIGINT) AS tokens_s,"
        " 1 + (src_num % 3) AS w_s FROM d GROUP BY 1, 2), "
        "tot AS (SELECT CAST(sum(w_s) AS BIGINT) AS sw,"
        " CAST(sum(tokens_s) AS BIGINT) AS tt FROM ps), "
        "r AS (SELECT source, least(CAST(1000000 AS BIGINT),"
        " CAST(floor((CAST(w_s AS DOUBLE)"
        " * floor(5.0e-1 * CAST(tt AS DOUBLE)))"
        " / (CAST(sw AS DOUBLE) * CAST(tokens_s AS DOUBLE))"
        " * 1.0e6) AS BIGINT)) AS rate_pm FROM ps CROSS JOIN tot) "
        f"SELECT doc_id, d.source, rate_pm, {bucket} < rate_pm AS keep"
        " FROM d JOIN r ON d.source = r.source"
    )


QUERIES["corpus_mixture"] = (q_corpus_mixture, _sql_corpus_mixture())


# -- dedup recall harness -------------------------------------------------------
# Measure, don't guess: the LSH banding (16 hashes × r=4 → s-curve knee near
# J≈0.6) is an approximation, so the engine ships the query that MEASURES it
# — exact n-gram-Jaccard pairs (≥ RECALL_J) as ground truth, MinHash-LSH
# candidates as the system under test, one row of (n_true, n_cand, n_hit,
# recall_e6). On the driver corpus this is 24/25 = 0.96 recall: the missed
# pair is real LSH behavior, reported rather than hidden. At 100 TB the
# exact side is the expensive leg — the harness runs on a sampled slice
# (both legs are per-doc-set closed, so any md5 doc sample is valid input).
RECALL_J = 500_000  # ground-truth near-dup: exact Jaccard ≥ 0.5


def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), stop_df=NGRAM_STOP_DF
    ).filter(F.col("jaccard_e6") >= RECALL_J).select("d1", "d2")
    cand = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(_docs(spark, sf_dir))
    )
    hit = truth.join(cand.hint("shuffle_hash"), ["d1", "d2"], "left_semi")
    return (
        truth.agg(F.count("*").alias("n_true"))
        .crossJoin(cand.agg(F.count("*").alias("n_cand")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
        .select(
            "n_true", "n_cand", "n_hit",
            # degenerate-slice guard (ADVICE r3): zero ground-truth pairs
            # must yield NULL, not NaN/divide-by-zero divergence
            F.when(
                F.col("n_true") > F.lit(0),
                F.floor(
                    F.col("n_hit").cast("double")
                    / F.col("n_true").cast("double") * F.lit(1.0e6)
                ).cast("long"),
            ).alias("recall_e6"),
        )
    )


def _sql_dedup_recall() -> str:
    truth_sql = dedup.ngram_jaccard_sql(stop_df=NGRAM_STOP_DF)
    cand_sql = dedup.minhash_lsh_sql()
    return (
        f"WITH tr AS (SELECT d1, d2 FROM ({truth_sql}) x"
        f" WHERE jaccard_e6 >= {RECALL_J}), "
        f"ca AS ({cand_sql}), "
        "hit AS (SELECT * FROM tr WHERE EXISTS (SELECT 1 FROM ca"
        " WHERE ca.d1 = tr.d1 AND ca.d2 = tr.d2)) "
        "SELECT (SELECT count(*) FROM tr) AS n_true,"
        " (SELECT count(*) FROM ca) AS n_cand,"
        " (SELECT count(*) FROM hit) AS n_hit,"
        " CASE WHEN (SELECT count(*) FROM tr) > 0 THEN"
        " CAST(floor(CAST((SELECT count(*) FROM hit) AS DOUBLE)"
        " / CAST((SELECT count(*) FROM tr) AS DOUBLE) * 1.0e6) AS BIGINT)"
        " END AS recall_e6"
    )


QUERIES["dedup_recall"] = (q_dedup_recall, _sql_dedup_recall())
