"""Partition-local ANN index artifacts (SURVEY §7-M8 option c).

The reference's HNSW layer (``vectordb_optimized.py:271-280``, search
``:507-575``) answers a SINGLE query in sub-millisecond time from one
in-memory graph. A data-parallel engine can't share one mutable graph
across executors — but it can give every *partition* its own small
index, built once at write time, and answer a query with one map-side
job:

- **build** (``partitioned_build``): hash-repartition the table, then
  ``mapInPandas`` runs a seeded NumPy k-means over each partition's
  vectors and emits ONE artifact row per partition — packed binary
  columns (centroids, list offsets, ids, list-grouped f32 matrix).
  The artifact table persists as plain parquet (``save``/``load``);
  rebuilding is never needed at query time.
- **search** (``partitioned_search``): one job. Every artifact task
  deserializes its partition's index (a zero-copy ``np.frombuffer``),
  ranks its local centroids against the query, exact-scans only the
  ``nprobe`` nearest lists, and yields a partition-local top-k; a
  native TakeOrderedAndProject merges ``partitions × k`` rows.

Latency: the whole query is one stage + a bounded merge — no shuffle,
no window, no second job. Scale: at 100 TB with ~10⁵ partitions each
artifact row is a few MB, tasks stream them independently, and the
scan fraction is ``nprobe / n_lists`` of the table with *exact*
distances on everything scanned (IVF-Flat sharded per partition;
memory-constrained deployments layer PQ codes via ``ann.ivfpq``
instead — this path optimizes single-query latency, not footprint).

Distances reuse the exact kernels' formulas (float64 accumulation,
``functions/distances.py``): recall loss comes only from unprobed
lists, never from quantization.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ARTIFACT_SCHEMA = (
    "part_id int, n int, dims int, n_lists int, "
    "centroids binary, offsets binary, ids binary, vmat binary"
)


def _kmeans_np(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded k-means++ (NumPy): partition-local training data is a few
    thousand rows, so a handful of Lloyd iterations converges in
    milliseconds inside the build task."""
    n = len(x)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    cents = np.empty((k, x.shape[1]), dtype=np.float64)
    cents[0] = x[rng.integers(n)]
    d2 = ((x - cents[0]) ** 2).sum(1)
    for i in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents[i] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, ((x - cents[i]) ** 2).sum(1))
    for _ in range(iters):
        # assign (chunked GEMM form: ||x||² - 2x·c + ||c||²)
        dist = (
            (x ** 2).sum(1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents ** 2).sum(1)[None, :]
        )
        assign = dist.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                cents[j] = x[m].mean(0)
    return cents


def partitioned_build(
    df: DataFrame,
    n_parts: int = 32,
    n_lists: int = 16,
    kmeans_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Build the artifact table: one row per partition holding that
    partition's packed IVF-Flat index. Deterministic: partitioning is
    an id-hash, k-means is seeded per partition."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in batches if not pdf.empty]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        x = np.stack(
            [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]]
        )
        x64 = x.astype(np.float64)
        cents = _kmeans_np(x64, n_lists, kmeans_iters, seed + pid)
        ll = len(cents)
        dist = (
            (x64 ** 2).sum(1)[:, None]
            - 2.0 * (x64 @ cents.T)
            + (cents ** 2).sum(1)[None, :]
        )
        assign = dist.argmin(1)
        # (list, id) order — id-ascending within each list so scan-side
        # tie-breaks can honor the (dist, id) contract
        order = np.lexsort((ids, assign))
        offsets = np.searchsorted(assign[order], np.arange(ll + 1)).astype(
            np.int64
        )
        yield pd.DataFrame(
            {
                "part_id": [pid],
                "n": [len(ids)],
                "dims": [x.shape[1]],
                "n_lists": [ll],
                "centroids": [cents.tobytes()],
                "offsets": [offsets.tobytes()],
                "ids": [ids[order].tobytes()],
                "vmat": [np.ascontiguousarray(x[order]).tobytes()],
            }
        )

    return (
        df.select(id_col, vec_col)
        .repartition(n_parts, id_col)
        .mapInPandas(build, schema=ARTIFACT_SCHEMA)
    )


def save_index(index_df: DataFrame, path: str) -> None:
    """Persist one artifact file per partition (``part_id=N/`` dirs) —
    the layout :func:`open_index` serves from."""
    index_df.write.mode("overwrite").partitionBy("part_id").parquet(path)


def load_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Disk-backed serving path: tasks read their own artifact file and keep
# the deserialized arrays in a worker-global cache. The in-DataFrame
# search above ships every artifact row through Arrow on EVERY query
# (~index-size bytes per query); this path ships only a part_id stub per
# task, so a warm query is pure compute + the single-job floor — the
# closest Spark gets to the reference's resident-HNSW latency regime.
# Cache key is (path, part_id): point new index builds at new (versioned)
# paths, as the catalog does for snapshots.
# ---------------------------------------------------------------------------

_WORKER_CACHE: dict = {}


def _load_artifact(path: str, pid: int):
    key = (path, pid)
    art = _WORKER_CACHE.get(key)
    if art is None:
        import pyarrow.parquet as papq

        t = papq.read_table(f"{path}/part_id={pid}")
        row = {
            "dims": t["dims"][0].as_py(),
            "n_lists": t["n_lists"][0].as_py(),
            "centroids": t["centroids"][0].as_py(),
            "offsets": t["offsets"][0].as_py(),
            "ids": t["ids"][0].as_py(),
            "vmat": t["vmat"][0].as_py(),
        }
        art = _unpack(row)
        _WORKER_CACHE[key] = art
    return art


def open_index(spark, path: str, slots: int | None = None) -> DataFrame:
    """Stub table (one row per saved artifact) driving the cached
    serving path. Create once, reuse across queries. ``slots`` bounds
    the task count — a task serves several artifacts sequentially; the
    default (half the default parallelism) halves per-task scheduling
    overhead on the single-query path while leaving every core a
    second stub to steal. On a large cluster pass ``slots=len(pids)``
    for full fan-out.

    FILESYSTEM REQUIREMENT: discovery (``os.listdir`` here) and the
    executor-side ``pyarrow`` artifact reads both use plain POSIX
    paths — the artifact dir must be a filesystem visible to driver
    AND executors under the same path (NFS, FUSE-mounted object
    store, or local mode). Plain hdfs://s3a:// URIs are not wired;
    mount them or copy artifacts to shared storage first."""
    import os

    pids = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(path)
        if e.startswith("part_id=")
    )
    if slots is None:
        slots = max(1, min(len(pids), spark.sparkContext.defaultParallelism // 2))
    stubs = spark.createDataFrame(
        [(p, path) for p in pids], "part_id int, path string"
    )
    return stubs.repartition(slots, "part_id").localCheckpoint()


def partitioned_search_indexed(
    stubs: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int | None = None,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Single-query search over :func:`open_index` stubs: each task
    loads (once) and probes its partition's cached artifact."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid, path in zip(pdf["part_id"], pdf["path"]):
                cents, offsets, ids, vmat = _load_artifact(path, int(pid))
                rid, rd = _scan_lists(
                    cents, offsets, ids, vmat, q, k, nprobe, metric
                )
                if len(rid):
                    yield pd.DataFrame({id_col: rid, "dist": rd})

    out = stubs.mapInPandas(scan, schema=f"{id_col} long, dist double")
    if round_digits is not None:
        out = out.withColumn("dist", F.round("dist", round_digits))
    return out.orderBy("dist", id_col).limit(k)


def _unpack(row):
    dims, ll = int(row["dims"]), int(row["n_lists"])
    cents = np.frombuffer(row["centroids"], dtype=np.float64).reshape(ll, dims)
    offsets = np.frombuffer(row["offsets"], dtype=np.int64)
    ids = np.frombuffer(row["ids"], dtype=np.int64)
    vmat = np.frombuffer(row["vmat"], dtype=np.float32).reshape(-1, dims)
    return cents, offsets, ids, vmat


def _scan_lists(
    cents, offsets, ids, vmat, q: np.ndarray, k: int,
    nprobe: int | None, metric: str
):
    """Probe the nprobe nearest lists, exact distances on their rows.
    Returns (ids, dists) of the partition-local top-k. ``nprobe=None``
    resolves against this artifact's local list count
    (:func:`ann.ivf.auto_nprobe`), so the width tracks however many
    lists the partition was built with."""
    from fastpyvectordb_spark.ann.ivf import _resolve_nprobe

    nprobe = _resolve_nprobe(nprobe, len(cents))
    if metric == "ip":
        crank = -(cents @ q)
    elif metric == "cosine":
        cn = np.sqrt((cents ** 2).sum(1)) + 1e-10
        crank = 1.0 - (cents @ q) / (cn * (np.sqrt(q @ q) + 1e-10))
    else:
        crank = ((cents - q) ** 2).sum(1)
    probe = np.argsort(crank)[: min(nprobe, len(cents))]
    segs = [np.arange(offsets[l], offsets[l + 1]) for l in probe]
    if not segs:
        return ids[:0], np.empty(0)
    sel = np.concatenate(segs)
    if len(sel) == 0:
        return ids[:0], np.empty(0)
    v = vmat[sel].astype(np.float64)
    if metric == "l2":
        d = np.sqrt(np.maximum(((v - q) ** 2).sum(1), 0.0))
    elif metric == "ip":
        d = -(v @ q)
    else:
        vn = np.sqrt((v ** 2).sum(1)) + 1e-10
        d = 1.0 - (v @ q) / (vn * (np.sqrt(q @ q) + 1e-10))
    kk = min(k, len(sel))
    # (dist, id)-exact cut — topk_rows_tied picks the sampled pruning
    # path on wide buckets (round 9) and falls back to lexsort only
    # when a distance tie (duplicate vectors) crosses the boundary,
    # preserving the knn_join tie-break contract the merge relies on
    from fastpyvectordb_spark.operators.knn import topk_rows_tied

    p = topk_rows_tied(d[None, :], ids[sel], kk)[0]
    return ids[sel[p]], d[p]


def partitioned_search(
    index_df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int | None = None,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Single-query search: ONE map-side job over the artifact table +
    TakeOrdered merge. Output (id_col, dist), same contract as
    :func:`operators.knn.knn`."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                cents, offsets, ids, vmat = _unpack(row)
                rid, rd = _scan_lists(
                    cents, offsets, ids, vmat, q, k, nprobe, metric
                )
                if len(rid):
                    yield pd.DataFrame({id_col: rid, "dist": rd})

    out = index_df.mapInPandas(scan, schema=f"{id_col} long, dist double")
    if round_digits is not None:
        out = out.withColumn("dist", F.round("dist", round_digits))
    return out.orderBy("dist", id_col).limit(k)


def _scan_artifact_batch(
    cents, offsets, ids, vmat, qids, qmat, k, nprobe, metric, id_col
) -> pd.DataFrame | None:
    """All queries against one partition artifact. Full probing
    (nprobe >= n_lists) takes a vectorized GEMM fast path — one
    (Q, n) distance block per artifact instead of per-query gathers —
    which makes the cached-artifact serving path an exact batch
    scanner. ``nprobe=None`` resolves per artifact (see
    :func:`_scan_lists`)."""
    from fastpyvectordb_spark.ann.ivf import _resolve_nprobe

    nprobe = _resolve_nprobe(nprobe, len(cents))
    if nprobe >= len(cents) and len(ids):
        v = vmat.astype(np.float64)
        if metric == "l2":
            d = (
                (v ** 2).sum(1)[None, :]
                - 2.0 * (qmat @ v.T)
                + (qmat ** 2).sum(1)[:, None]
            )
            d = np.sqrt(np.maximum(d, 0.0))
        elif metric == "ip":
            d = -(qmat @ v.T)
        else:
            vn = np.sqrt((v ** 2).sum(1)) + 1e-10
            qn = np.sqrt((qmat ** 2).sum(1)) + 1e-10
            d = 1.0 - (qmat @ v.T) / (qn[:, None] * vn[None, :])
        kk = min(k, d.shape[1])
        # tie-aware (dist, id) cut per query row — see _scan_lists
        from fastpyvectordb_spark.operators.knn import topk_rows_tied

        p = topk_rows_tied(d, ids, kk)
        rows = np.arange(len(qmat))[:, None]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, p.shape[1]),
                id_col: ids[p].ravel(),
                "dist": d[rows, p].ravel(),
            }
        )
    out_q, out_i, out_d = [], [], []
    for qi in range(len(qids)):
        rid, rd = _scan_lists(
            cents, offsets, ids, vmat, qmat[qi], k, nprobe, metric
        )
        out_q.append(np.full(len(rid), qids[qi], dtype=np.int64))
        out_i.append(rid)
        out_d.append(rd)
    if not out_q:
        return None
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_i),
            "dist": np.concatenate(out_d),
        }
    )


def partitioned_search_indexed_batch(
    stubs: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Batch search over the cached serving artifacts. With
    ``nprobe >= n_lists`` this is an EXACT batch scanner whose
    per-partition matrices live in the worker cache — no Arrow
    shipping of vectors per call, unlike ``knn_batch_gemm`` which
    re-streams the table through Arrow on every invocation."""
    from pyspark.sql import Window

    qids = queries_pdf["query_id"].to_numpy()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["query_vec"]]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid, path in zip(pdf["part_id"], pdf["path"]):
                cents, offsets, ids, vmat = _load_artifact(path, int(pid))
                out = _scan_artifact_batch(
                    cents, offsets, ids, vmat, qids, qmat, k, nprobe,
                    metric, id_col,
                )
                if out is not None:
                    yield out

    out = stubs.mapInPandas(
        scan, schema=f"query_id long, {id_col} long, dist double"
    )
    if round_digits is not None:
        out = out.withColumn("dist", F.round("dist", round_digits))
    w = Window.partitionBy("query_id").orderBy("dist", id_col)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "dist")
    )


def partitioned_search_batch(
    index_df: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Batch variant: the (small) query block ships in the closure, each
    artifact task answers every query against its partition, and one
    window merge ranks ``partitions × k`` rows per query. Output
    (query_id, rank, id_col, dist) — the knn_join contract (incl. its
    ROUND-6 + id tie-break)."""
    from pyspark.sql import Window

    qids = queries_pdf["query_id"].to_numpy()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["query_vec"]]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                cents, offsets, ids, vmat = _unpack(row)
                out = _scan_artifact_batch(
                    cents, offsets, ids, vmat, qids, qmat, k, nprobe,
                    metric, id_col,
                )
                if out is not None:
                    yield out

    out = index_df.mapInPandas(
        scan, schema=f"query_id long, {id_col} long, dist double"
    )
    if round_digits is not None:
        out = out.withColumn("dist", F.round("dist", round_digits))
    w = Window.partitionBy("query_id").orderBy("dist", id_col)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "dist")
    )
