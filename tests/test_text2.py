"""Brute-force ground-truth tests for the round-3 batch-2 text queries:
chunk_dedup (exact substring dedup at chunk granularity), pii_scrub,
tfidf_topterms. Oracle parity at sf0.01 is covered by test_oracle_parity;
these tests check the SEMANTICS against independent Python implementations
on planted inputs.
"""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_merge_spark.queries import text2


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string,"
                                       " source string, n_chars long")


def _mk(i, txt):
    return (i, txt, "en", "synth", len(txt))


# ---------------------------------------------------------------------------
# chunk_dedup
# ---------------------------------------------------------------------------
def _brute_chunk_dedup(rows, w=text2.CHUNK_W):
    chunks = {}  # chunk -> (doc_id, pos)
    per_doc = {}
    for doc_id, txt, *_ in sorted(rows):
        ws = [x for x in txt.lower().split(" ") if x]
        ck = [" ".join(ws[i * w:(i + 1) * w])
              for i in range(math.ceil(len(ws) / w))]
        per_doc[doc_id] = ck
        for pos, c in enumerate(ck):
            if c not in chunks or (doc_id, pos) < chunks[c]:
                chunks[c] = (doc_id, pos)
    out = {}
    for doc_id, ck in per_doc.items():
        kept = [c for pos, c in enumerate(ck) if chunks[c] == (doc_id, pos)]
        out[doc_id] = (len(ck), len(kept), " ".join(kept))
    return out


def test_chunk_dedup_first_occurrence_wins(spark, tmp_path):
    boiler = " ".join(f"b{i}" for i in range(text2.CHUNK_W))  # one full chunk
    uniq = lambda d: " ".join(f"u{d}w{i}" for i in range(text2.CHUNK_W))
    rows = [
        _mk(1, boiler + " " + uniq(1)),          # first owner of boiler
        _mk(2, uniq(2) + " " + boiler),          # loses boiler at pos 1
        _mk(3, boiler),                          # loses its only chunk
        _mk(4, "short tail"),                    # sub-chunk-width doc
        _mk(5, uniq(5) + " " + uniq(5)),         # within-doc repeat: keeps pos 0 only
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    _docs_df(spark, rows).write.parquet(f"{sf}/documents.parquet")

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_kept"])
        for r in text2.q_chunk_dedup(spark, sf).collect()
    }
    assert got == _brute_chunk_dedup(rows)
    assert got[3] == (1, 0, "")             # fully deduped doc still emitted
    assert got[5] == (2, 1, uniq(5))        # within-doc repeat collapsed
    assert got[2][2] == uniq(2)             # boiler removed, unique kept


def test_chunk_dedup_no_duplicate_chunks_survive(spark, sf_dir):
    out = text2.q_chunk_dedup(spark, sf_dir)
    from pyspark.sql import functions as F

    survivors = out.filter(F.col("text_kept") != "").select(
        "doc_id",
        F.posexplode(F.split("text_kept", " ")).alias("p", "w"),
    ).withColumn("c", F.floor(F.col("p") / text2.CHUNK_W))
    # regroup survivors into chunks again: every chunk string must be unique.
    # collect_list after groupBy is unordered — sort by p explicitly.
    rechunk = survivors.groupBy("doc_id", "c").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "w"))),
                lambda s: s["w"],
            ),
        ).alias("chunk")
    )
    # only FULL-width chunks are guaranteed unique (a doc's trailing partial
    # chunk can coincide with another doc's partial tail only if they were
    # the same chunk pre-dedup — also covered)
    dup = rechunk.groupBy("chunk").count().filter("count > 1").count()
    assert dup == 0


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------
def test_pii_scrub_counts_and_clean_text(spark, sf_dir):
    out = text2.q_pii_scrub(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out[:50]:
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    blob = " ".join(r["scrubbed"] for r in out[:200])
    assert "<EMAIL>" in blob and "<PHONE>" in blob and "<IP>" in blob
    assert not re.search(text2.EMAIL_RE, blob)
    assert not re.search(text2.PHONE_RE, blob)
    assert not re.search(text2.IP_RE, blob)


# ---------------------------------------------------------------------------
# tfidf_topterms
# ---------------------------------------------------------------------------
def test_tfidf_matches_brute_force(spark, sf_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]).to_pylist()
    n_docs = len(tbl)
    tf = {}
    dfreq = Counter()
    for row in tbl:
        ws = [w for w in row["text"].lower().split(" ") if w]
        c = Counter(ws)
        tf[row["doc_id"]] = c
        dfreq.update(c.keys())
    expect = {}
    for doc_id, c in tf.items():
        scored = sorted(
            (
                (-math.floor(n * math.log(n_docs / dfreq[t]) * 1e6), t)
                for t, n in c.items()
            )
        )[: text2.TFIDF_K]
        expect[doc_id] = [(t, -s) for s, t in scored]

    got = {}
    for r in text2.q_tfidf_topterms(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["score_e6"]))
    # top_k_agg emits in (neg_score, term) order already
    assert got == {k: v for k, v in expect.items() if v}


def test_lm_quality_matches_brute_force(spark, tmp_path):
    """Tiny planted corpus: per-token unigram cross-entropy computed by an
    independent plain-Python pass must equal the distributed two-pass plan."""
    import math
    from collections import Counter

    rows = [
        ("d1", "the cat sat on the mat"),       # common words → low CE
        ("d2", "the the the the"),              # most frequent only → lowest
        ("d3", "zyx qwv zyx plugh"),            # rare words → high CE
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id string, text string") \
        .write.parquet(f"{sf}/documents.parquet")

    toks = {d: [w for w in t.lower().split() if w] for d, t in rows}
    corpus = Counter(w for ws in toks.values() for w in ws)
    n_total = sum(corpus.values())
    expect = {}
    for d, ws in toks.items():
        sum_e9 = sum(math.floor(math.log(corpus[w] / n_total) * 1e9) for w in ws)
        ce_e6 = math.floor(-sum_e9 / len(ws) / 1e3)
        expect[d] = (len(ws), ce_e6, ce_e6 <= text2.CE_KEEP_E6)

    got = {
        r["doc_id"]: (r["n_tokens"], r["ce_e6"], r["keep"])
        for r in text2.q_lm_quality(spark, sf).collect()
    }
    assert got == expect
    # orders as intended: repetition < mixed < rare
    assert got["d2"][1] < got["d1"][1] < got["d3"][1]


def test_corpus_mixture_rates_hit_target_shares(spark, sf_dir):
    """Rates must be inversely proportional to per-source token mass and
    proportional to target weight; an independent Python pass over the raw
    docs must reproduce every rate and keep flag exactly."""
    import hashlib
    import math
    from collections import defaultdict

    from osm_merge_spark.queries import text as tq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text").collect()
    import re
    tok = lambda s: len(re.findall(r"[a-z0-9]+", s.lower()))
    tokens = defaultdict(int)
    for r in docs:
        tokens[r["source"]] += tok(r["text"])
    w = {s: 1 + int(s[3:]) % 3 for s in tokens}
    sw, tt = sum(w.values()), sum(tokens.values())
    t_target = math.floor(0.5 * tt)
    rate = {
        s: min(1_000_000,
               math.floor((w[s] * t_target) / (sw * tokens[s]) * 1e6))
        for s in tokens
    }

    got = {r["doc_id"]: r for r in
           tq.q_corpus_mixture(spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for r in docs:
        g = got[r["doc_id"]]
        assert g["rate_pm"] == rate[r["source"]], r["source"]
        bucket = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8],
                     16) % 1_000_000
        assert g["keep"] == (bucket < rate[r["source"]])
    # weight-3 sources sample at ~3x the rate of weight-1 sources
    r1 = [v for s, v in rate.items() if w[s] == 1]
    r3 = [v for s, v in rate.items() if w[s] == 3]
    if r1 and r3:
        assert min(r3) > max(r1)
