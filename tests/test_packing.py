"""Sequence packing + distributed prefix sum + filter funnel.

Pins: (1) the two-pass global prefix sum equals the single-partition
window cumsum (the thing it replaces at scale); (2) pack_sequences
bin/straddle invariants; (3) funnel_counts equals per-stage direct
filter counts and is monotone non-increasing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
    packing_stats,
)
from fastpyvectordb_spark.operators.textanalysis import funnel_counts


@pytest.fixture(scope="module")
def toks(spark):
    rows = [(i, f"s{i % 3}", (i * 37) % 23) for i in range(500)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def test_global_prefix_sum_matches_window(spark, toks):
    got = {
        r["doc_id"]: r["prefix_sum"]
        for r in global_prefix_sum(
            toks, "doc_id", "n_tokens", num_partitions=7
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["doc_id"]: r["c"]
        for r in toks.withColumn(
            "c", F.sum("n_tokens").over(w) - F.col("n_tokens")
        ).collect()
    }
    assert got == want


def test_global_prefix_sum_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert global_prefix_sum(df, "doc_id", "n_tokens").count() == 0


def test_pack_sequences_invariants(spark, toks):
    packed = pack_sequences(
        toks, seq_len=64, tokens_col="n_tokens", stream_col="source"
    ).collect()
    by_stream: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r["source"], r["doc_id"])):
        by_stream.setdefault(r["source"], []).append(r)
    for rows in by_stream.values():
        cum = 0
        for r in rows:
            assert r["start_tok"] == cum
            assert r["seq_id"] == cum // 64
            end_bin = (cum + max(r["n_tokens"], 1) - 1) // 64
            assert r["straddles"] == (
                r["n_tokens"] > 0 and end_bin > r["seq_id"]
            )
            cum += r["n_tokens"]


def test_pack_sequences_global_path(spark, toks):
    # no stream_col -> two-pass prefix sum over the whole frame
    packed = pack_sequences(toks, seq_len=64, tokens_col="n_tokens")
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    cum = 0
    for r in rows:
        assert r["start_tok"] == cum
        cum += r["n_tokens"]


def test_packing_stats(spark, toks):
    packed = pack_sequences(
        toks, seq_len=64, tokens_col="n_tokens", stream_col="source"
    )
    stats = {
        r["source"]: r
        for r in packing_stats(
            packed, seq_len=64, tokens_col="n_tokens", stream_col="source"
        ).collect()
    }
    totals = {
        r["source"]: r["t"]
        for r in toks.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for s, t in totals.items():
        assert stats[s]["n_tokens"] == t
        assert stats[s]["n_seqs"] == (t + 63) // 64


def test_pack_sequences_rejects_bad_seq_len(toks):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(toks, seq_len=0)


def test_funnel_counts_matches_direct_filters(spark, toks):
    stages = [
        ("small", F.col("n_tokens") < 20),
        ("even_doc", F.col("doc_id") % 2 == 0),
        ("stream0", F.col("source") == "s0"),
    ]
    out = {r["stage"]: r for r in funnel_counts(toks, stages).collect()}
    acc = toks
    n_in = toks.count()
    for name, pred in stages:
        acc = acc.filter(pred)
        n_out = acc.count()
        assert out[name]["n_in"] == n_in
        assert out[name]["n_out"] == n_out
        assert out[name]["n_dropped"] == n_in - n_out
        n_in = n_out


def test_funnel_counts_null_predicate_drops(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, v string"
    )
    out = funnel_counts(df, [("v_is_a", F.col("v") == "a")]).collect()[0]
    assert (out["n_in"], out["n_out"]) == (2, 1)


def test_funnel_counts_requires_stages(spark, toks):
    with pytest.raises(ValueError, match="stage"):
        funnel_counts(toks, [])


def test_chunk_documents_edges(spark):
    from fastpyvectordb_spark.operators.textanalysis import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a" * 1000),  # 3 chunks at 512/64 (starts 0, 448, 896)
            (2, "short"),     # 1 chunk
            (3, ""),          # no chunks
            (4, "x" * 448),   # exactly one step: 1 chunk
            (5, "y" * 449),   # one char past: 2 chunks, last 1 char
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_chars=512, overlap=64)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 3
    assert [r["start_char"] for r in by_doc[1]] == [0, 448, 896]
    assert len(by_doc[1][2]["chunk_text"]) == 1000 - 896
    assert len(by_doc.get(2, [])) == 1
    assert 3 not in by_doc
    assert len(by_doc.get(4, [])) == 1
    assert len(by_doc.get(5, [])) == 2
    assert by_doc[5][1]["chunk_text"] == "y"
    # overlap property: consecutive chunks share `overlap` chars
    assert by_doc[1][0]["chunk_text"][448:] == by_doc[1][1]["chunk_text"][:64]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from fastpyvectordb_spark.operators.textanalysis import chunk_documents

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_chars=100, overlap=100)


def test_global_prefix_sum_double_values(spark):
    rows = [(i, float(i) * 0.5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        global_prefix_sum(df, "doc_id", "w", num_partitions=5).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0.0
    for r in got:
        assert r["prefix_sum"] == pytest.approx(acc)
        acc += r["w"]
