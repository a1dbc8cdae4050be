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
  - resident serving+DML  1M-row collection: pack build, packed ANN
                          batch QPS, upsert/delete with incremental
                          pack refresh (round 7 — VERDICT r6 #7)
  - oversize ANN          2M-row collection (genuinely above the pack
                          threshold): distributed probed fallback,
                          ann_cluster rewrite, file-skip fraction

Usage: python tools/scale_spotcheck.py [n_docs] [sections]

``sections`` is a comma-list of ``emb,text,serve,big,bignd`` (default:
``emb,text,serve``; ``big`` is the 10M×64 section — request it
explicitly, it ignores ``n_docs`` and always runs at 10M).
Run the sections as SEPARATE invocations on disk-constrained hosts:
each fresh JVM starts with empty shuffle dirs, so every section gets
the full free-disk headroom (the 1.1M-doc text section's verify join
alone spills ~60 GB — one shared session accumulating three sections'
shuffle files blows an ~80 GB budget even with aggressive cleaner GC).
Each invocation prints one JSON line; merge the keys into README's
scale table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

# 1M-row single-JVM run: the default 8g driver heap can fail an AQE
# auto-broadcast mid-join (the whole "cluster" lives in one process
# here — on a real cluster executors hold these builds)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "28g")
# reclaim shuffle files between phases (default sweep is 30min —
# slower than this script fills the disk)
os.environ.setdefault(
    "SPARK_GRAFT_EXTRA_CONF", "spark.cleaner.periodicGC.interval=2min"
)

from pyspark.sql import functions as F  # noqa: E402

from fastpyvectordb_spark.session import get_spark  # noqa: E402


def _build_emb(spark, n: int, dims: int = 64):
    """The bench generator at 10× scale (shared by emb/serve sections)."""
    return (
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


def _query_pdf(emb, n: int):
    return (
        emb.filter(F.col("vec_id") % (n // 100) == 0)
        .limit(100)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .toPandas()
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sections = set(
        (sys.argv[2] if len(sys.argv) > 2 else "emb,text,serve").split(",")
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    out: dict = {"n_rows": n, "sections": sorted(sections)}
    dims = 64

    if "emb" in sections:
        _section_emb(spark, n, dims, out)
    if "text" in sections:
        _section_text(spark, n, out)
    if "serve" in sections:
        _section_serve(spark, n, dims, out)
    if "big" in sections:
        _section_big(spark, dims, out)
    if "bignd" in sections:
        _section_bignd(spark, dims, out)
    if "graph" in sections:
        _section_graph(spark, out)
    if "huge" in sections:
        _section_huge(spark, dims, out)

    print(json.dumps(out))


def _partial(out: dict) -> None:
    """Crash insurance: long phases can die (disk, OOM) hours in —
    emit the accumulated numbers after every phase so a failed section
    still yields its completed measurements. The FINAL plain-JSON line
    remains the authoritative record."""
    print("PARTIAL " + json.dumps(out), flush=True)


def _section_emb(spark, n: int, dims: int, out: dict) -> None:
    emb = _build_emb(spark, n, dims)
    qpdf = _query_pdf(emb, n)
    from fastpyvectordb_spark.operators.knn import knn_batch_gemm

    t0 = time.perf_counter()
    cnt = knn_batch_gemm(emb, qpdf, k=10, metric="cosine").count()
    out["knn_batch_gemm_sec"] = round(time.perf_counter() - t0, 1)
    assert cnt == len(qpdf) * 10
    _partial(out)

    # -- embedding near-dup, auto default, 1M x 64 (VERDICT r8 #4):
    # the OTHER LLM-pipeline headline. The WORK-based router decides
    # the regime: pre-round-9 (256-cluster cap) the kept work at 1M
    # was ~1.75e11 pair-sims and auto routed to the banded LSH arm;
    # with the 1024-cluster cap the tighter angular bounds keep the
    # work under the 8·N·√N budget and auto runs the EXACT arm — at
    # 233 s measured r10 (vs the 40+-minute exact wall the router was
    # built to avoid). Either outcome is correct; `neardup_routed_1m`
    # records which regime ran so the README row stays honest.
    from fastpyvectordb_spark.operators.dedup import embedding_neardup_topk

    stats: dict = {}
    t0 = time.perf_counter()
    nd = embedding_neardup_topk(
        emb, k=10, centroids="seed", _stats_out=stats
    ).count()
    out["neardup_routed_1m_sec"] = round(time.perf_counter() - t0, 1)
    out["neardup_routed_1m"] = 1 if stats.get("routed") else 0
    out["neardup_max_task_rows_est"] = stats.get("max_task_rows_est")
    assert nd == 10
    _partial(out)

    # task-memory bound engaged for real (VERDICT r8 #2): force a
    # small per-task budget so clusters sub-split — peak mining-group
    # size must obey 2× the budget no matter the corpus size. Run on a
    # 250k-row subset: sub-splitting multiplies the λ-seed shuffle by
    # n_sub over every kept cluster-pair block, so the probe's cost is
    # duplication-bound — at the full 1M with budget 2000 it spills
    # >80 GB (measured: killed two runs on this host), while 250k with
    # budget 400 exercises the identical mechanism (n_sub ≥ 2, 2×
    # bound asserted) within this host's disk. Production never
    # triggers splitting at these corpus sizes (default budget is
    # ~262k rows/side); the bound exists for billion-row clusters.
    emb_sub = emb.filter(F.col("vec_id") % 4 == 0) if n > 20_000 else emb
    rows_actual = emb_sub.count()
    budget = 400
    stats2: dict = {}
    t0 = time.perf_counter()
    embedding_neardup_topk(
        emb_sub, k=10, centroids="seed", max_gemm_rows=budget,
        _stats_out=stats2,
    ).count()
    out["neardup_subsplit_250k_sec"] = round(time.perf_counter() - t0, 1)
    out["neardup_subsplit_n_sub_max"] = stats2.get("n_sub_max")
    out["neardup_subsplit_max_task_rows_est"] = stats2.get(
        "max_task_rows_est"
    )
    # at probe scale clusters MUST split; the gate mirrors the REAL
    # auto-K sizing (min(1024, isqrt(rows)) — ann/ivf auto cap, round
    # 9) over the REAL sub-corpus count, not the old fixed-256
    # estimate (ADVICE r9): avg cluster ≈ rows/K > 2·budget forces
    # n_sub ≥ 2 somewhere; tiny smoke-test n keeps clusters under
    # the budget
    auto_k = max(2, min(1024, math.isqrt(max(rows_actual, 1))))
    if rows_actual // auto_k > 2 * budget:
        assert stats2["n_sub_max"] > 1
    assert stats2["max_task_rows_est"] <= 2 * budget
    _partial(out)


def _section_text(spark, n: int, out: dict) -> None:
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
    _partial(out)

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
    _partial(out)

    # -- pipeline_clean_corpus at scale (VERDICT r7 #5): the
    # LLM-pipeline headline — quality → lang-id → fingerprint dedup →
    # mixture agg, same one-scan fused projection as the suite query,
    # over this synthetic corpus (docs/sec here is the linear-scaling
    # anchor for bench's pipeline_docs_per_sec)
    from pyspark.sql import Window

    from fastpyvectordb_spark.operators import textanalysis as T

    t0 = time.perf_counter()
    exprs = T.quality_exprs(F.col("text"))
    kept = docs.select(
        "doc_id",
        exprs["n_tokens"].alias("n_tokens"),
        exprs["quality_score"].alias("quality_score"),
        T.lang_id_expr(F.col("text")).alias("lang_pred"),
        T.fingerprint_expr(F.col("text")).alias("fingerprint"),
    )
    # no quality cut here: the synthetic pseudo-word corpus scores
    # below the real threshold (no stopwords), which would empty the
    # pipeline. Passing EVERY doc through the fingerprint window dedup
    # is the conservative (more work per doc) variant of the suite
    # query — the right shape for a throughput anchor.
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    dedup = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_langs = (
        dedup.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .count()
    )
    out["pipeline_clean_corpus_sec"] = round(time.perf_counter() - t0, 1)
    out["pipeline_docs_per_sec_scale"] = round(
        out["n_docs"] / max(out["pipeline_clean_corpus_sec"], 1e-9), 1
    )
    assert n_langs >= 1
    _partial(out)


def _section_serve(spark, n: int, dims: int, out: dict) -> None:
    emb = _build_emb(spark, n, dims)
    qpdf = _query_pdf(emb, n)
    # -- resident serving + DML at 1M (round 7) ------------------------
    # The pack threshold is sized to the reference's always-in-RAM
    # regime (80M floats), so 1M × 64 packs RESIDENT: measure the pack
    # build, the packed ANN batch serving rate, and point DML against
    # the incremental (O(changed rows)) pack refresh at this size.
    import tempfile

    from fastpyvectordb_spark.catalog import VectorDB

    db = VectorDB(spark, tempfile.mkdtemp() + "/scaledb")
    c = db.create_collection("vecs1m", dimensions=dims, metric="cosine")
    t0 = time.perf_counter()
    # label metadata column: the verified-path delete(where=…)/update()
    # probes below (VERDICT r9 #7) need a filterable field at 1M
    c.insert_batch(
        emb.select(
            F.col("vec_id").cast("string").alias("id"),
            "embedding",
            F.pmod(F.col("vec_id"), F.lit(997)).cast("int").alias("label"),
        )
    )
    out["collection_ingest_1m_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    c.build_ann_index(max_iter=10)
    out["ann_train_1m_sec"] = round(time.perf_counter() - t0, 1)
    q0 = [float(x) for x in qpdf["query_vec"].iloc[0]]
    t0 = time.perf_counter()
    assert c.pack_serving() is not None, "1M x 64 must pack resident"
    out["pack_build_1m_sec"] = round(time.perf_counter() - t0, 1)
    qbatch = [list(v) for v in qpdf["query_vec"].iloc[:32]]
    t0 = time.perf_counter()  # first call assigns the pack to lists
    res = c.search_ann_batch(qbatch, k=10, nprobe=8)
    out["ann_resident_first_batch_sec"] = round(
        time.perf_counter() - t0, 1
    )
    assert res is not None and len(res) == 32 * 10
    t0 = time.perf_counter()
    for _ in range(3):
        res = c.search_ann_batch(qbatch, k=10, nprobe=8)
    out["ann_resident_batch_qps_1m"] = round(
        3 * 32 / (time.perf_counter() - t0), 1
    )
    rows_1k = [
        (f"u{i}", [float(x) for x in qpdf["query_vec"].iloc[0]], -2)
        for i in range(1000)
    ]
    up_df = spark.createDataFrame(
        rows_1k, "id string, embedding array<float>, label int"
    )
    t0 = time.perf_counter()
    c.upsert(up_df)
    out["upsert_1k_at_1m_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    assert c.pack_serving() is not None  # incremental refresh, 0 jobs
    out["pack_refresh_after_upsert_1m_sec"] = round(
        time.perf_counter() - t0, 2
    )
    t0 = time.perf_counter()
    c.delete(ids=[f"u{i}" for i in range(1000)], verify_existing=False)
    out["delete_fast_1k_at_1m_sec"] = round(time.perf_counter() - t0, 2)
    _partial(out)

    # -- verified-path DML at 1M (VERDICT r9 #7): the r9 bench's
    # weakest DML row (delete_rows_per_sec 260 at sf0.1) was
    # calibration-suspect; these anchor the verified scan paths at
    # 1M rows so the README scale table carries real numbers.
    # update(): 100-id metadata merge — bucket-pruned read, ≤20k-row
    # driver-local upsert commit
    upd_ids = [str(i) for i in range(100)]
    t0 = time.perf_counter()
    n_upd = c.update(upd_ids, metadata={"label": -1})
    out["update_100_at_1m_sec"] = round(time.perf_counter() - t0, 2)
    out["update_rows_per_sec_1m"] = round(
        n_upd / max(time.perf_counter() - t0, 1e-9), 1
    )
    assert n_upd == 100
    # delete(ids=…) verified (existence scan + DV kill commit)
    del_ids = [str(i) for i in range(200_000, 201_000)]
    t0 = time.perf_counter()
    c.delete(ids=del_ids)
    dt = time.perf_counter() - t0
    out["delete_verified_1k_at_1m_sec"] = round(dt, 2)
    out["delete_verified_rows_per_sec_1m"] = round(1000 / dt, 1)
    # delete(where=…): full filter scan → DV kill commit (~1k matches)
    before = c.count()
    t0 = time.perf_counter()
    c.delete(where={"label": 553})
    dt = time.perf_counter() - t0
    matched = before - c.count()
    out["delete_where_matched_1m"] = int(matched)
    out["delete_where_sec_1m"] = round(dt, 2)
    out["delete_where_rows_per_sec_1m"] = round(matched / dt, 1)
    assert matched > 900  # ≈ 1M/997 ids ≡ 553 (mod 997), minus overlaps
    _partial(out)

    # -- collection ANN at genuine oversize scale ----------------------
    # 2M x 64 = 128M floats > SERVING_PACK_MAX_FLOATS (80M): search_ann
    # runs the DISTRIBUTED probed fallback for real (no threshold
    # monkeypatching), and optimize(ann_cluster=True) turns the probe
    # into file skipping — the 100 TB shape measured end to end.
    n_over = max(2 * n, 2_000_000)
    emb_over = (
        spark.range(n_over)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda d: (
                    F.sin(
                        F.col("id") * 0.7 + d * 1.3
                        + F.col("id") * d * 0.0137
                    )
                    + F.sin(F.col("id") * 91.7 + d * 47.111) * 0.1
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(64)
    )
    c = db.create_collection("vecs2m", dimensions=dims, metric="cosine")
    t0 = time.perf_counter()
    c.insert_batch(
        emb_over.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        )
    )
    out["collection_ingest_2m_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    c.build_ann_index(max_iter=10)
    out["ann_train_2m_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    hits = c.search_ann(q0, k=10, nprobe=8)
    out["ann_fallback_scan_2m_sec"] = round(time.perf_counter() - t0, 1)
    assert hits and len(hits) == 10
    t0 = time.perf_counter()
    # explicit file count: the default 128 MB sizing gives ~1 file per
    # bucket at this corpus size (no split → nothing to skip); at
    # 100 TB the same default yields MANY files per bucket, which 128
    # files stands in for here
    c.optimize(ann_cluster=True, target_partitions=256)
    out["ann_cluster_optimize_2m_sec"] = round(time.perf_counter() - t0, 1)
    st = c._ann()
    ver = c._current_version()
    files, _ = c._resolve(ver)
    ranges = st._file_list_ranges(files)
    import numpy as np

    d0 = ((st.centroids - np.asarray(q0)) ** 2).sum(axis=1)
    probes = {int(i) for i in np.argsort(d0)[:8]}
    keep = [
        f for f in files
        if f not in ranges
        or any(ranges[f][0] <= p <= ranges[f][1] for p in probes)
    ]
    out["ann_files_skipped_frac_2m"] = round(
        1 - len(keep) / max(len(files), 1), 4
    )
    t0 = time.perf_counter()
    hits2 = c.search_ann(q0, k=10, nprobe=8)
    out["ann_fallback_clustered_2m_sec"] = round(
        time.perf_counter() - t0, 1
    )
    assert [i for i, _ in hits2][:1] == [i for i, _ in hits][:1]


def _section_big(spark, dims: int, out: dict) -> None:
    """10M×64 spotcheck (VERDICT r10 #4): the 100× story previously
    extrapolated from 1-2M anchors — this section measures the next
    decade directly. Phases (crash-insured with _partial, the
    longest-wall one last):

      1. ingest 10M into a collection (manifest commit path)
      2. serving decision: 10M×64 = 640M floats is 8× over the 80M
         pack threshold — pack_serving() must return None and
         search_ann must take the DISTRIBUTED probed-scan arm
      3. IVF-PQ at 10M: auto n_lists (√N ≈ 3162), coarse fit bounded
         to 1M rows (fit-on-sample/assign-everything), OPQ on a 60k
         residual sample; codes at rest = 10M × 16 B ≈ 160 MB —
         build wall, batch-search wall, recall@10 vs exact
    Phase 4 (the near-dup router) lives in its OWN section ``bignd``
    — its banded arm's bucket shuffle must not share disk headroom
    with these phases' shuffle files (measured disk-fill kill).

    Run as its own invocation (fresh JVM/shuffle dirs):
    ``python tools/scale_spotcheck.py 10000000 big``
    """
    n = 10_000_000
    emb = _build_emb(spark, n, dims)
    qpdf = _query_pdf(emb, n)
    import tempfile

    import numpy as np

    from fastpyvectordb_spark.catalog import VectorDB

    # -- 1. ingest ------------------------------------------------------
    db = VectorDB(spark, tempfile.mkdtemp() + "/scaledb10m")
    c = db.create_collection("vecs10m", dimensions=dims, metric="cosine")
    t0 = time.perf_counter()
    c.insert_batch(
        emb.select(F.col("vec_id").cast("string").alias("id"), "embedding")
    )
    dt = time.perf_counter() - t0
    out["collection_ingest_10m_sec"] = round(dt, 1)
    out["ingest_vec_per_sec_10m"] = round(n / dt, 1)
    _partial(out)

    # -- 2. serving decision ---------------------------------------------
    t0 = time.perf_counter()
    c.build_ann_index(max_iter=10)  # coarse fit bounded to 200k rows
    out["ann_train_10m_sec"] = round(time.perf_counter() - t0, 1)
    assert c.pack_serving() is None, (
        "10M x 64 = 640M floats must NOT pack resident (threshold 80M)"
    )
    q0 = [float(x) for x in qpdf["query_vec"].iloc[0]]
    t0 = time.perf_counter()
    # no nprobe: config ef_search (50) resolves through the scaled
    # anchor — auto_nprobe(n_lists) — exercising the round-11 default
    hits = c.search_ann(q0, k=10)
    out["ann_distributed_scan_10m_sec"] = round(time.perf_counter() - t0, 1)
    assert hits and len(hits) == 10
    _partial(out)

    # -- 3. IVF-PQ at 10M -------------------------------------------------
    from fastpyvectordb_spark.ann.ivfpq import (
        ivfpq_build,
        ivfpq_search_batch,
    )
    from fastpyvectordb_spark.operators.knn import knn_batch_gemm

    t0 = time.perf_counter()
    idx = ivfpq_build(
        emb, n_lists=None, m_subspaces=16, n_centroids=256, max_iter=10,
        train_rows=60_000, opq_iters=15, coarse_train_rows=1_000_000,
    ).colocate()
    out["ivfpq_build_10m_sec"] = round(time.perf_counter() - t0, 1)
    out["ivfpq_n_lists_10m"] = len(idx.centroids)  # √10M ≈ 3162
    out["ivfpq_codes_mb_10m"] = round(n * 16 / 2**20, 1)
    _partial(out)

    from fastpyvectordb_spark.ann.ivf import auto_nprobe

    out["ivfpq_auto_nprobe_10m"] = auto_nprobe(len(idx.centroids))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cnt = ivfpq_search_batch(idx, qpdf, k=10, nprobe=8).count()
        best = min(best, time.perf_counter() - t0)
    assert cnt == len(qpdf) * 10
    out["ivfpq_batch_100q_10m_sec"] = round(best, 1)
    out["ivfpq_batch_qps_10m"] = round(len(qpdf) / best, 1)
    # same batch at the round-11 DEFAULT width (None → 2.5% of lists,
    # 80 probes here): the honest cost of holding the scan fraction
    t0 = time.perf_counter()
    cnt = ivfpq_search_batch(idx, qpdf, k=10).count()
    dt = time.perf_counter() - t0
    assert cnt == len(qpdf) * 10
    out["ivfpq_batch_100q_auto_10m_sec"] = round(dt, 1)
    out["ivfpq_batch_auto_qps_10m"] = round(len(qpdf) / dt, 1)

    # recall vs exact on 32 queries, decomposed: raw ADC at fixed
    # nprobe=8 and at the auto width (80), refined at 8/32, plus the
    # DIRECT candidate-coverage number (is the true neighbor's list in
    # the probe set?) — this separates the two loss sources: coverage
    # (what nprobe buys) vs ADC code resolution (what M/K buy). The
    # first auto-width run measured raw ADC FLAT at 0.80 from 8 to 80
    # probes — code resolution, not coverage, caps raw recall at 10M.
    sample = qpdf.head(32)
    exact = knn_batch_gemm(emb, sample, k=10, metric="l2").toPandas()
    adc = ivfpq_search_batch(idx, sample, k=10, nprobe=8).toPandas()
    adc_auto = ivfpq_search_batch(idx, sample, k=10).toPandas()
    ref8 = ivfpq_search_batch(
        idx, sample, k=10, nprobe=8, refine_df=emb, refine=200
    ).toPandas()
    ref = ivfpq_search_batch(
        idx, sample, k=10, nprobe=32, refine_df=emb, refine=200
    ).toPandas()
    for name, df in (("ivfpq_recall_10m", adc),
                     ("ivfpq_recall_auto_10m", adc_auto),
                     ("ivfpq_refined8_recall_10m", ref8),
                     ("ivfpq_refined_recall_10m", ref)):
        hits_n = 0
        for qid in sample["query_id"]:
            a = set(df.loc[df.query_id == qid, "vec_id"])
            e = set(exact.loc[exact.query_id == qid, "vec_id"])
            hits_n += len(a & e)
        out[name] = round(hits_n / (len(sample) * 10), 4)

    # candidate coverage: list assignment of every exact top-10 id vs
    # each query's ranked probe list (same centroid scorer the search
    # uses) — one 320-id semi-join against the codes table
    from fastpyvectordb_spark.ann.ivf import centroid_probe_scores

    eids = [int(x) for x in exact["vec_id"].unique()]
    lmap = {
        int(r["vec_id"]): int(r["list_id"])
        for r in idx.codes.select("vec_id", "list_id")
        .filter(F.col("vec_id").isin(eids)).collect()
    }
    qm = np.stack([np.asarray(v, float) for v in sample["query_vec"]])
    order = np.argsort(centroid_probe_scores(idx.centroids, qm), axis=1)
    for width, name in ((8, "ivfpq_coverage8_10m"),
                        (out["ivfpq_auto_nprobe_10m"],
                         "ivfpq_coverage_auto_10m")):
        hit = tot = 0
        for i, qid in enumerate(sample["query_id"]):
            probes = set(int(x) for x in order[i, :width])
            for vid in exact.loc[exact.query_id == qid, "vec_id"]:
                tot += 1
                hit += int(lmap[int(vid)] in probes)
        out[name] = round(hit / tot, 4)
    _partial(out)

def _section_bignd(spark, dims: int, out: dict) -> None:
    """10M near-dup router (VERDICT r10 #4, phase 4): regime choice
    (kept-work vs the 8·N·√N budget) + the measured wall of whichever
    arm ran. Its OWN invocation/JVM — the banded arm ships the vector
    payload once per band (6 bands × 10M ≈ 20+ GB of bucket shuffle),
    which must not share disk headroom with the IVF-PQ phases'
    accumulated shuffle files (the combined run filled this host's
    disk — measured kill).

    ``python tools/scale_spotcheck.py 10000000 bignd``
    """
    n = 10_000_000
    emb = _build_emb(spark, n, dims)
    from fastpyvectordb_spark.operators.dedup import embedding_neardup_topk

    stats: dict = {}
    t0 = time.perf_counter()
    nd = embedding_neardup_topk(
        emb, k=10, centroids="seed", _stats_out=stats
    ).count()
    out["neardup_routed_10m_sec"] = round(time.perf_counter() - t0, 1)
    out["neardup_routed_10m"] = 1 if stats.get("routed") else 0
    out["neardup_kept_work_10m"] = stats.get("kept_work")
    out["neardup_work_budget_10m"] = stats.get("work_budget")
    out["neardup_max_task_rows_est_10m"] = stats.get("max_task_rows_est")
    assert nd == 10
    _partial(out)




def _section_graph(spark, out: dict, n_edges: int = 10_000_000) -> None:
    """At-scale traversal evidence (VERDICT r11 #7): depth-3
    ``traverse_df`` over a 10M-edge synthetic graph, production
    (src-clustered edge table + shuffled-hash hops, r11 shape) vs the
    pre-r11 shape (per-hop join of a ``distinct`` edge table, unhinted
    — above the broadcast threshold Spark sort-merge-joins it, i.e.
    re-sorts the 10M-edge side EVERY hop). Asserts the production
    at-scale plan has no edge-table broadcast and no sort, and that
    both variants return identical row counts. The frontier here is
    deliberately small (32 seeds x ~10 out-degree): hop compute is
    negligible, so wall-clock isolates the per-hop edge-table cost —
    the term that scales with corpus size at 100 TB."""
    from pyspark.sql import functions as F

    from fastpyvectordb_spark.operators.graph import traverse_df

    n_nodes = max(1, n_edges // 10)
    # localCheckpoint pins the corpus so both shapes read the SAME
    # materialized edges (a lazy synthetic lineage would re-generate
    # 10M rows per scan and the first-run shape would additionally
    # absorb plan/codegen compilation — the r12 first cut measured
    # exactly that confound: 30.5 vs 13.9 s that reversed to a wash
    # once warmed and pinned)
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).cast("string").alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes))
        .cast("string").alias("dst"),
    ).localCheckpoint()
    start = spark.createDataFrame(
        [(str(i),) for i in range(32)], "start_id string"
    )

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    def _plan(df) -> str:
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    def _unhinted(start_df):
        # pre-r11 shape: distinct edge table, unhinted hop joins
        e0 = edges.select("src", "dst").distinct()
        frontier = start_df.select(
            "start_id",
            F.col("start_id").alias("node"),
            F.array(F.col("start_id")).alias("path_arr"),
            F.lit(0).alias("depth"),
        )
        results = None
        for hop in range(1, 4):
            frontier = (
                frontier.join(e0, frontier.node == e0.src)
                .filter(~F.array_contains(F.col("path_arr"), F.col("dst")))
                .select(
                    "start_id",
                    F.col("dst").alias("node"),
                    F.concat(
                        F.col("path_arr"), F.array(F.col("dst"))
                    ).alias("path_arr"),
                    F.lit(hop).alias("depth"),
                )
            )
            step = frontier.select(
                "start_id",
                F.col("node").alias("end_id"),
                "depth",
                F.array_join("path_arr", "->").alias("path"),
            )
            results = step if results is None else results.unionByName(step)
        return results

    res_after = traverse_df(edges, start, max_depth=3)
    results = _unhinted(start)
    plan_after = _plan(res_after)
    plan_before = _plan(results)

    # warm both plan families once, then interleave best-of-2 (host
    # noise on this fleet swings >3x within a run)
    spark.sparkContext.setJobDescription("graph spotcheck: warmup")
    _noop(results)
    _noop(res_after)
    t_b, t_a = [], []
    for _rep in range(2):
        spark.sparkContext.setJobDescription("graph spotcheck: pre-r11 shape")
        t0 = time.perf_counter()
        _noop(_unhinted(start))
        t_b.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription("graph spotcheck: r11 SHJ shape")
        t0 = time.perf_counter()
        _noop(traverse_df(edges, start, max_depth=3))
        t_a.append(time.perf_counter() - t0)
    out["graph_traverse10m_shj_sec"] = round(min(t_a), 1)
    out["graph_traverse10m_unhinted_sec"] = round(min(t_b), 1)
    out["graph_traverse10m_shj_runs"] = [round(t, 1) for t in t_a]
    out["graph_traverse10m_unhinted_runs"] = [round(t, 1) for t in t_b]

    for tag, plan in (("shj", plan_after), ("unhinted", plan_before)):
        out[f"graph_traverse10m_{tag}_nodes"] = {
            k: plan.count(k)
            for k in (
                "ShuffledHashJoin", "SortMergeJoin",
                "BroadcastHashJoin", "Exchange", "Sort ",
            )
        }
    # the at-scale production plan must never broadcast or sort the
    # edge table
    assert out["graph_traverse10m_shj_nodes"]["BroadcastHashJoin"] == 0
    assert out["graph_traverse10m_shj_nodes"]["Sort "] == 0
    assert out["graph_traverse10m_shj_nodes"]["ShuffledHashJoin"] >= 3

    # result parity between the two shapes
    n_after = res_after.count()
    n_before = results.count()
    out["graph_traverse10m_rows"] = int(n_after)
    assert n_after == n_before, (n_after, n_before)
    _partial(out)


if __name__ == "__main__":
    main()


def _section_huge(spark, dims: int, out: dict, n: int = 100_000_000) -> None:
    """100M-row decade probe (VERDICT r11 #8, bounded to this sandbox's
    ~75 GB disk): ingest wall (parquet write of the synthetic corpus,
    the q_ingest_100k shape at 1000x), exact batch GEMM over the
    written table (32 queries, one job), and the serving-regime
    assertion (the packed kernel must refuse 6.4G floats = 80x its
    threshold). IVF-PQ build and the near-dup router stay at the 10M
    decade (`big`/`bignd`) — at 100M they are multi-hour walls that
    this sandbox's disk cannot hold alongside the corpus."""
    import shutil
    import tempfile

    from fastpyvectordb_spark.catalog import VectorDB
    from fastpyvectordb_spark.operators.knn import knn_batch_gemm

    base = tempfile.mkdtemp(prefix="huge100m_")
    gen = (
        spark.range(n)
        .select(
            F.col("id").cast("string").alias("id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda d: (
                    F.sin(F.col("id") * 0.7 + d * 1.3
                          + F.col("id") * d * 0.0137)
                    + F.sin(F.col("id") * 91.7 + d * 47.111) * 0.1
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    db = VectorDB(spark, os.path.join(base, "db"))
    c = db.create_collection("huge", dimensions=dims, metric="cosine")
    spark.sparkContext.setJobDescription(
        "huge spotcheck: 100M collection ingest"
    )
    t0 = time.perf_counter()
    got = c.insert_batch(gen)
    dt = time.perf_counter() - t0
    assert got == n, got
    out["huge_ingest_sec"] = round(dt, 1)
    out["huge_ingest_vec_per_sec"] = round(n / dt, 1)
    _partial(out)

    # serving regime: 100M x 64 = 6.4e9 floats, 80x the 8e7 pack
    # threshold — the packed path must refuse
    assert c.pack_serving() is None
    out["huge_pack_refused"] = True

    emb = c.df().select(
        F.col("id").cast("long").alias("vec_id"), "embedding"
    )
    qpdf = (
        emb.filter(F.col("vec_id") % (n // 32) == 0)
        .limit(32)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .toPandas()
    )
    spark.sparkContext.setJobDescription("huge spotcheck: 100M exact GEMM")
    t0 = time.perf_counter()
    cnt = knn_batch_gemm(emb, qpdf, k=10, metric="cosine").count()
    out["huge_knn_batch_gemm_sec"] = round(time.perf_counter() - t0, 1)
    assert cnt == len(qpdf) * 10
    _partial(out)
    shutil.rmtree(base, ignore_errors=True)
