"""One-shot large-scale spot check (VERDICT r5 #7): the empirical
datapoint that the 100× claims extrapolate.

No sf1 parquet fixture exists in /root/testdata, so this synthesizes a
deterministic ~1M-row corpus (the same sinusoidal-manifold generator
bench.py uses at 100k, and a seeded text corpus with planted near-dups)
and runs the four headline shapes once each:

  - knn_batch_gemm        100 queries over 1M x 64 embeddings
  - dedup_minhash_lsh     1M docs (10% planted near-duplicates)
  - bm25_build            postings over the 1M-doc corpus
  - bm25_query            20 queries against the prebuilt postings

Usage: python tools/scale_spotcheck.py [n_docs]
Prints one JSON line; paste the numbers into README's scale table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

# 1M-row single-JVM run: the default 8g driver heap can fail an AQE
# auto-broadcast mid-join (the whole "cluster" lives in one process
# here — on a real cluster executors hold these builds)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "28g")

from pyspark.sql import functions as F  # noqa: E402

from fastpyvectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {"n_rows": n}

    # -- embeddings: the bench generator at 10x scale ------------------
    dims = 64
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda d: (
                    F.sin(F.col("id") * 0.7 + d * 1.3 + F.col("id") * d * 0.0137)
                    + F.sin(F.col("id") * 91.7 + d * 47.111) * 0.1
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    qpdf = (
        emb.filter(F.col("vec_id") % (n // 100) == 0)
        .limit(100)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .toPandas()
    )
    from fastpyvectordb_spark.operators.knn import knn_batch_gemm

    t0 = time.perf_counter()
    cnt = knn_batch_gemm(emb, qpdf, k=10, metric="cosine").count()
    out["knn_batch_gemm_sec"] = round(time.perf_counter() - t0, 1)
    assert cnt == len(qpdf) * 10

    # -- text corpus: seeded sentences, 10% planted near-dups.
    # Vocabulary must be LARGE (50k pseudo-words): a toy vocab makes
    # every doc share most shingles, LSH bands all collide, and the
    # verify stage degenerates to ~N² — a corpus-generation artifact,
    # not an operator property.
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), (F.pmod(F.col("id"), 40) + 20)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id") * 1315423911 + i * 2654435761),
                        F.lit(50_000),
                    ),
                ),
            ),
        ).alias("text"),
    )
    dups = (
        base.filter(F.pmod("doc_id", 10) == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.substring(
                F.col("text"), 1, F.floor(F.length("text") * 0.8).cast("int")
            ).alias("text"),
        )
    )
    docs = base.unionByName(dups).repartition(64).localCheckpoint()
    out["n_docs"] = docs.count()

    from fastpyvectordb_spark.operators.dedup import minhash_lsh_duplicates

    t0 = time.perf_counter()
    n_pairs = minhash_lsh_duplicates(docs).count()
    out["dedup_minhash_lsh_sec"] = round(time.perf_counter() - t0, 1)
    out["dedup_pairs"] = n_pairs

    from fastpyvectordb_spark.operators.bm25 import BM25Index

    t0 = time.perf_counter()
    idx = BM25Index.build(docs)
    out["bm25_build_sec"] = round(time.perf_counter() - t0, 1)

    # query terms drawn from the same pseudo-word distribution
    qterms = [
        r["text"].split(" ")[:2]
        for r in base.filter(F.pmod("doc_id", n // 20) == 3).limit(20).collect()
    ]
    queries = [" ".join(t) for t in qterms]
    t0 = time.perf_counter()
    nq = idx.search_batch(queries, k=10).count()
    out["bm25_query20_sec"] = round(time.perf_counter() - t0, 1)
    assert nq > 0

    print(json.dumps(out))


if __name__ == "__main__":
    main()
