"""SparkSession factory with scale-oriented defaults.

Defaults target the local[32] test harness but every knob is the one
you'd set on a 1000-executor cluster too: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow on (vectorized
pandas-UDF exchange), sensible shuffle parallelism.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fastpyvectordb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    blas_pin = {
        var: "1"
        for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")
    }
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events table stores TIMESTAMP(NANOS); read as
        # long and convert in the loader (Spark has no ns timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    # One BLAS thread per task slot in executor-side Python workers:
    # every core already runs a Spark task, so a multi-threaded
    # OpenBLAS inside each of the 32 workers oversubscribes the box
    # ~32x (and OpenBLAS spin-waits, starving the JVM long after the
    # GEMM finishes). Driver-side BLAS stays multi-threaded for the
    # local-GEMM fast path.
    for var, val in blas_pin.items():
        builder = builder.config(f"spark.executorEnv.{var}", val)
    # escape hatch for one-off heavy runs ("key=value;key=value") —
    # e.g. tools/scale_spotcheck.py sets an aggressive
    # spark.cleaner.periodicGC.interval so multi-phase shuffle files
    # are reclaimed between phases instead of accumulating until the
    # default 30min sweep (a 1M-row multi-phase run spills faster than
    # that on this host's disk)
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            key, val = pair.split("=", 1)
            # visible in startup output: a leftover env var from a
            # heavy-run tool would otherwise invisibly alter every
            # later get_spark() in the process (ADVICE r9)
            logging.getLogger(__name__).info(
                "SPARK_GRAFT_EXTRA_CONF applying %s=%s",
                key.strip(), val.strip(),
            )
            builder = builder.config(key.strip(), val.strip())
    return builder.getOrCreate()
