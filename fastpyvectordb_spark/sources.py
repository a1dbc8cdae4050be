"""Ingestion sources: corpus readers + reference-DB migration.

Two jobs live here:

1. **Corpus readers** (``read_documents_jsonl`` / ``read_documents_csv``)
   — the 100 TB path. JSONL is the lingua franca of LLM training data;
   both readers are plain ``spark.read`` calls (distributed, splittable,
   schema-projected at the scan) run in PERMISSIVE mode with a
   ``_corrupt_record`` capture column, because at corpus scale malformed
   lines are a statistical certainty and a fail-stop read of 100 TB is
   not an option. Corrupt rows are quarantined, never silently dropped.

2. **Reference-DB migration importers** — the "switch to this engine"
   story. A user of the reference (jcolano/fastpyvectordb) has
   collections persisted in one of two on-disk formats; both import
   into a :class:`~fastpyvectordb_spark.catalog.VectorDB` collection:

   - the default layout (``vectordb.py:300-325`` save): per-collection
     ``config.json`` + ``metadata.json`` (id→metadata) +
     ``vectors.npy`` (a dict id→float32 array pickled through
     ``np.save``; loaded exactly as the reference does with
     ``np.load(..., allow_pickle=True).item()``, ``vectordb.py:293-296``),
   - the PYVDB binary format (``binary_persistence.py:42-140``):
     ``PYVDB`` magic, version byte, JSON config header, pickled
     id-mapping + metadata blocks, then an ``(n, dims)`` uint32 pair
     and the raw float32 matrix.

   TRUST: both formats embed **pickle**, which executes code on load —
   the same trust model as the reference's own ``load`` path. Only
   import files you (or a trusted reference deployment) wrote.

   The importer reads driver-side by design: a reference DB is a
   single-process NumPy engine, so its entire dataset fits one machine
   by construction — the migration is a one-time, dimension-table-sized
   load, chunked into ``insert_batch`` commits so arbitrarily large
   collections never materialize as one Python list.
"""

from __future__ import annotations

import json
import os
import pickle
import struct
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

    from fastpyvectordb_spark.catalog import Collection, VectorDB

DOCUMENT_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


# ---------------------------------------------------------------------------
# Corpus readers (distributed — the scale path)
# ---------------------------------------------------------------------------

def read_documents_jsonl(
    spark: "SparkSession",
    path: str,
    text_col: str = "text",
    id_col: str | None = "doc_id",
) -> "DataFrame":
    """Distributed JSONL corpus read → the ``documents`` table shape.

    PERMISSIVE + ``_corrupt_record``: malformed lines land whole in the
    quarantine column with every data field null; callers split them
    off with :func:`split_corrupt`. Missing ``lang``/``source`` come
    back null (schema-projected, not inferred — at 100 TB a sampling
    inference pass over the whole corpus is a wasted read). When
    ``id_col`` is absent in the data a deterministic id is synthesized
    from the text hash — stable across re-reads and partitionings,
    unlike ``monotonically_increasing_id``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col or "doc_id", LongType()),
            StructField(text_col, StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
    good_id = F.when(
        F.col(id_col or "doc_id").isNull() & F.col("_corrupt_record").isNull(),
        F.abs(F.xxhash64(F.col(text_col))),
    ).otherwise(F.col(id_col or "doc_id"))
    return df.select(
        good_id.alias("doc_id"),
        F.col(text_col).alias("text"),
        "lang",
        "source",
        F.length(text_col).alias("n_chars"),
        "_corrupt_record",
    )


def read_documents_csv(
    spark: "SparkSession",
    path: str,
    text_col: str = "text",
    header: bool = True,
    sep: str = ",",
) -> "DataFrame":
    """Distributed CSV corpus read, same contract as the JSONL reader
    (PERMISSIVE, quarantine column, projected schema)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField(text_col, StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return df.select(
        "doc_id",
        F.col(text_col).alias("text"),
        "lang",
        "source",
        F.length(text_col).alias("n_chars"),
        "_corrupt_record",
    )


def split_corrupt(df: "DataFrame") -> tuple["DataFrame", "DataFrame"]:
    """(clean_rows_without_quarantine_col, corrupt_rows).

    The input is cached here out of necessity, not convenience: Spark
    refuses any query whose scan would reference ONLY the internal
    corrupt-record column (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN`` — both branches here trip it on a raw reader
    plan), and its documented remedy is to materialize the parsed
    rows first. Call ``.unpersist()`` on the returned ``clean`` frame
    when done. For a corpus too large to cache, skip this helper and
    run two independent reads instead (PERMISSIVE for the data,
    ``badRecordsPath`` for the quarantine)."""
    from pyspark.sql import functions as F

    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, bad


# ---------------------------------------------------------------------------
# Reference-DB migration (driver-side one-time load, chunked commits)
# ---------------------------------------------------------------------------

def _ingest_rows(
    db: "VectorDB",
    name: str,
    dimensions: int,
    metric: str,
    rows_iter,
    batch_size: int,
) -> "Collection":
    from pyspark.sql import functions as F

    coll = db.create_collection(name, dimensions=dimensions, metric=metric)

    def flush(chunk: list[dict]) -> None:
        if not chunk:
            return
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        # explicit schema — inference would raise on a metadata key
        # whose values are all-None within this chunk; type each key
        # from its first non-None value (bool before int: bool IS an
        # int in Python), stringify non-scalars, default all-None to
        # string
        keys = sorted({k for r in chunk for k in r} - {"id", "embedding"})

        def key_type(k):
            for r in chunk:
                v = r.get(k)
                if v is None:
                    continue
                if isinstance(v, bool):
                    return BooleanType(), None
                if isinstance(v, int):
                    return LongType(), None
                if isinstance(v, float):
                    return DoubleType(), None
                if isinstance(v, str):
                    return StringType(), None
                return StringType(), json.dumps  # list/dict → JSON text
            return StringType(), None

        typed = {k: key_type(k) for k in keys}
        schema = StructType(
            [
                StructField("id", StringType()),
                StructField("embedding", ArrayType(DoubleType())),
                *[StructField(k, t) for k, (t, _) in typed.items()],
            ]
        )
        shaped = [
            {
                "id": r["id"],
                "embedding": r["embedding"],
                **{
                    k: (
                        conv(r[k])
                        if conv is not None and r.get(k) is not None
                        else r.get(k)
                    )
                    for k, (_, conv) in typed.items()
                },
            }
            for r in chunk
        ]
        batch = db.spark.createDataFrame(shaped, schema).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        coll.insert_batch(batch)

    chunk: list[dict] = []
    for row in rows_iter:
        chunk.append(row)
        if len(chunk) >= batch_size:
            flush(chunk)
            chunk = []
    flush(chunk)
    return coll


def import_reference_collection(
    db: "VectorDB",
    src_dir: str,
    name: str | None = None,
    batch_size: int = 50_000,
) -> "Collection":
    """Import a collection saved by the reference's default persistence
    (``vectordb.py:300-325``): ``config.json`` + ``vectors.npy`` +
    ``metadata.json`` in one directory. ``index.bin`` (hnswlib) is
    intentionally ignored — indexes are derived data; rebuild with
    ``ann.ivf``/``ann.nsw`` after import."""
    import numpy as np

    with open(os.path.join(src_dir, "config.json")) as f:
        config = json.load(f)
    # exactly the reference's own load expression (vectordb.py:293-296)
    vectors = np.load(
        os.path.join(src_dir, "vectors.npy"), allow_pickle=True
    ).item()
    meta_path = os.path.join(src_dir, "metadata.json")
    metadata: dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)

    def rows():
        # metadata first — id/embedding must win over a metadata key
        # that happens to be named "id"/"embedding" (same rule as
        # catalog.insert / server.insert_batch)
        for vid, vec in vectors.items():
            yield {
                **(metadata.get(vid) or {}),
                "id": str(vid),
                "embedding": [float(x) for x in vec],
            }

    return _ingest_rows(
        db,
        name or config["name"],
        int(config["dimensions"]),
        str(config.get("metric", "cosine")),
        rows(),
        batch_size,
    )


def import_reference_binary(
    db: "VectorDB",
    path: str,
    name: str,
    metric: str = "cosine",
    batch_size: int = 50_000,
) -> "Collection":
    """Import a PYVDB binary vector file
    (``binary_persistence.py:42-140``): magic, version, JSON header,
    pickled id-mapping (``{"ids": [...], "id_to_label", "label_to_id"}``
    — matrix row *i* belongs to ``ids[i]``), pickled metadata
    (id→dict), then ``(n_vectors, dimensions)`` as two uint32s and the
    row-major float32 matrix. ``path`` may be the save directory (the
    writer names the file ``data.bin``) or the file itself."""
    import numpy as np

    if os.path.isdir(path):
        path = os.path.join(path, "data.bin")
    with open(path, "rb") as f:
        magic = f.read(5)
        if magic != b"PYVDB":
            raise ValueError(f"not a PYVDB file (magic {magic!r})")
        (version,) = struct.unpack("B", f.read(1))
        if version != 1:
            raise ValueError(f"unsupported PYVDB version {version}")
        (header_size,) = struct.unpack("I", f.read(4))
        header = json.loads(f.read(header_size).decode("utf-8"))
        (id_size,) = struct.unpack("I", f.read(4))
        id_mapping = pickle.loads(f.read(id_size))  # trusted input only
        (meta_size,) = struct.unpack("I", f.read(4))
        metadata = pickle.loads(f.read(meta_size))  # trusted input only
        n, dims = struct.unpack("II", f.read(8))
        mat = np.frombuffer(f.read(n * dims * 4), dtype=np.float32).reshape(
            n, dims
        )

    ids = id_mapping["ids"]  # matrix row i belongs to ids[i]

    def rows():
        # metadata first — id/embedding must win (see note above)
        for i, ext_id in enumerate(ids):
            yield {
                **(metadata.get(ext_id) or {}),
                "id": str(ext_id),
                "embedding": [float(x) for x in mat[i]],
            }

    return _ingest_rows(
        db, name, int(header.get("dimensions", dims)), metric, rows(),
        batch_size,
    )
