"""Approximate-analytics (sketch) error gates — native Spark
capabilities the reference has no equivalent for (declared in SURVEY
§2.10 as gained-for-free; these tests pin their accuracy contracts
against exact twins, the same recall-gate pattern as the ANN ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastpyvectordb_spark.tables import load_table
from tests.conftest import SF_DIR


def test_hll_distinct_within_tolerance(spark):
    """approx_count_distinct (HyperLogLog++) within its documented rsd
    on every events column we'd dashboard."""
    ev = load_table(spark, SF_DIR, "events")
    for col in ("user_id", "event_type"):
        exact = ev.select(F.countDistinct(col)).head()[0]
        approx = ev.select(F.approx_count_distinct(col, rsd=0.02)).head()[0]
        assert abs(approx - exact) <= max(3, 0.06 * exact), (col, approx, exact)


def test_approx_percentile_within_tolerance(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.percentile("value", F.lit(0.5))).head()[0]
    approx = ev.select(F.percentile_approx("value", F.lit(0.5), 10_000)).head()[0]
    spread = (
        ev.select(F.max("value") - F.min("value")).head()[0] or 1.0
    )
    assert abs(approx - exact) <= 0.05 * spread, (approx, exact)


def test_freq_items_contains_true_top(spark):
    docs = load_table(spark, SF_DIR, "documents")
    true_top = (
        docs.groupBy("lang").count().orderBy(F.desc("count")).head()["lang"]
    )
    freq = docs.freqItems(["lang"], support=0.1).head()["lang_freqItems"]
    assert true_top in freq


def test_word_entropy_hand_checked(spark):
    import math
    from fastpyvectordb_spark.operators.textanalysis import word_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b"), (3, "a b c d")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in word_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_tokens"] == 4
    assert abs(out[2]["entropy"] - round(math.log(2), 6)) < 1e-9
    assert abs(out[3]["entropy"] - round(math.log(4), 6)) < 1e-9


def test_moore_lewis_prefers_in_domain_looking_docs(spark):
    """Candidates sharing the in-domain vocabulary must outscore
    candidates with disjoint vocabulary."""
    import math
    from fastpyvectordb_spark.operators.textanalysis import moore_lewis_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", "en"),
            (2, "alpha beta gamma", "en"),
            (10, "alpha beta alpha beta", "xx"),   # in-domain-looking
            (11, "zeta eta theta iota", "xx"),     # disjoint vocab
        ],
        "doc_id bigint, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in moore_lewis_scores(
            docs, in_domain=(F.col("lang") == "en")
        ).collect()
    }
    assert set(out) == {10, 11}  # only candidates are scored
    assert out[10]["ml_score"] > out[11]["ml_score"]
    assert out[10]["n_tokens"] == 4

    # hand-check one term: for doc 10's word "alpha":
    # c_in=4(2+2? no: en docs have alpha x3) — verify via formula
    # en tokens: doc1=5, doc2=3 → n_in=8; all tokens = 8+4+4=16
    # vocab V = |{alpha,beta,gamma,zeta,eta,theta,iota}| = 7
    # alpha: c_in=3, c_all=5 → term=ln((3+1)*(16+7)/((8+7)*(5+1)))
    term_alpha = math.log((4 * 23) / (15 * 6))
    # beta identical counts → same term; score = (2*t_a + 2*t_b)/4
    assert abs(out[10]["ml_score"] - round(term_alpha, 6)) < 2e-6
