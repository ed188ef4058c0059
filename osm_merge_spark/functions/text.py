"""Text-analysis kernels for the training-data pipeline — all native
Catalyst expressions (zero Python in the hot path), each with an exact
ANSI-SQL mirror for the DuckDB oracle.

Covers: tokenization, word shingles, token counting (BPE-ish regex),
quality scoring, language-ID (marker-word voting), rolling-hash document
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .geo import dlit

FP_P = 1099511627689  # rolling-hash modulus (~2^40: 131*P fits in int64)
FP_MUL = 131

TOKEN_RE = "[a-z0-9]+"
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]

# marker-word lexicons for language-ID voting (argmax with deterministic
# tie-break by fixed priority). Vocabulary-specific, like any n-gram LID.
LANG_MARKERS = {
    "en": ["the", "a", "table", "row", "value"],
    "de": ["der", "und", "das", "agg", "window"],
    "fr": ["le", "la", "et", "join", "merge"],
    "es": ["el", "los", "que", "scan", "filter"],
    "zh": ["zh", "hash", "sort", "batch", "stream"],
}
_LANG_PRIO = {"en": 4, "de": 3, "fr": 2, "es": 1, "zh": 0}


def words(text: Column) -> Column:
    """Non-empty whitespace tokens, lowercased."""
    return F.filter(F.split(F.lower(text), " "), lambda w: w != F.lit(""))


def words_sql(text: str) -> str:
    return f"list_filter(string_split(lower({text}), ' '), w -> w != '')"


def shingles(ws: Column, k: int = 3) -> Column:
    """Word k-grams as space-joined strings (array<string>); empty when the
    document has fewer than k words.

    The short-doc branch is guarded: sequence(1, n-k+1) with n<k would
    produce a DESCENDING [1, 0] (Spark defaults step to -1) and element_at
    would then raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode.
    CASE WHEN branches are lazily evaluated, so the sequence never runs for
    short docs — matching the DuckDB mirror's range(1,1) → [] behavior."""
    n = F.size(ws)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + F.lit(j)) for j in range(k)]
        ),
    )
    return F.when(n >= F.lit(k), grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(ws: str, k: int = 3) -> str:
    """ws must be a plain column name (lambda captures the outer row)."""
    join = " || ' ' || ".join(f"{ws}[i + {j}]" for j in range(k))
    return (
        f"list_transform(range(1, greatest(len({ws}) - {k - 1}, 0) + 1),"
        f" i -> {join})"
    )


def token_count(text: Column) -> Column:
    """BPE-ish token count via regex extraction (alnum runs)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0)))


def token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all(lower({text}), '{TOKEN_RE}'))"


def stop_count(ws: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))


def stop_count_sql(ws: str) -> str:
    lits = "', '".join(STOPWORDS)
    return f"len(list_filter({ws}, w -> w IN ('{lits}')))"


def lang_scores(ws: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))
    return out


def lang_pred(ws: Column) -> Column:
    """argmax language with deterministic priority tie-break: fold scores
    into score*10 + prio so a single greatest() decides."""
    scores = lang_scores(ws)
    adj = [
        (scores[lang].cast("long") * F.lit(10) + F.lit(prio))
        for lang, prio in _LANG_PRIO.items()
    ]
    m = F.greatest(*adj)
    expr = F.lit("??")
    for lang, prio in _LANG_PRIO.items():
        expr = F.when(m % 10 == F.lit(prio), F.lit(lang)).otherwise(expr)
    return expr


def lang_pred_sql(ws: str) -> str:
    adjs = []
    for lang, prio in _LANG_PRIO.items():
        lits = "', '".join(LANG_MARKERS[lang])
        adjs.append(
            f"(CAST(len(list_filter({ws}, w -> w IN ('{lits}'))) AS BIGINT)"
            f" * 10 + {prio})"
        )
    m = f"greatest({', '.join(adjs)})"
    cases = " ".join(
        f"WHEN ({m}) % 10 = {prio} THEN '{lang}'"
        for lang, prio in _LANG_PRIO.items()
    )
    return f"(CASE {cases} ELSE '??' END)"


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over the character stream:
    fold(acc*131 + code) mod P — a cheap content fingerprint whose SQL
    mirror folds in the identical order."""
    chars = F.filter(F.split(text, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_MUL) + c) % F.lit(FP_P),
    )


def rolling_fingerprint_sql(text: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(list_filter(string_split({text}, ''), c -> c != ''),"
        " c -> CAST(ascii(c) AS BIGINT))),"
        f" (a, b) -> (a * {FP_MUL} + b) % {FP_P})"
    )


def quality_score(n_words: Column, avg_len: Column, stop_ratio: Column) -> Column:
    """Linear quality heuristic in [0, ~1]: enough words, sane word length,
    some-but-not-all stopwords (mirrors C4-style quality filters)."""
    return (
        F.lit(0.4) * F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.least(avg_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(stop_ratio * F.lit(4.0), F.lit(1.0)))
    )


def quality_score_sql(n_words: str, avg_len: str, stop_ratio: str) -> str:
    return (
        f"({dlit(0.4)} * least(CAST({n_words} AS DOUBLE) / {dlit(100.0)}, {dlit(1.0)})"
        f" + {dlit(0.3)} * least({avg_len} / {dlit(8.0)}, {dlit(1.0)})"
        f" + {dlit(0.3)} * ({dlit(1.0)} - least({stop_ratio} * {dlit(4.0)}, {dlit(1.0)})))"
    )
