"""Physical-plan audits for the hot suite queries — the 100 TB
contract: filters pushed to scans, small sides broadcast, no
accidental cartesian products, codegen on expression stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.knn import knn, knn_join
from fastpyvectordb_spark.plans import assert_scale_safe, plan_report
from fastpyvectordb_spark.tables import load_table

# NOT sf0.001: the conftest embeddings fixture caches that exact scan,
# and Spark's cache lookup would substitute InMemoryTableScan (which
# has no PushedFilters) into these plans when the whole suite runs
SF = "/root/testdata/sf0.01"


def test_filtered_knn_pushes_filter(spark):
    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    plan = knn(emb, qvec, k=5, pre_filter=F.col("label") == 3)
    rep = assert_scale_safe(plan, expect_pushdown=True)
    assert any("label" in p for p in rep.pushed_filters)


def test_knn_single_query_no_shuffle_of_vectors(spark):
    # TakeOrderedAndProject: partial top-k per partition, no Exchange
    # of the vector table itself
    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    rep = plan_report(knn(emb, qvec, k=5))
    assert rep.exchanges == 0, rep.summary()
    assert "TakeOrderedAndProject" in __import__(
        "fastpyvectordb_spark.plans.advisor", fromlist=["physical_plan"]
    ).physical_plan(knn(emb, qvec, k=5))


def test_batch_knn_broadcasts_queries(spark):
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rep = plan_report(knn_join(emb, qs, k=5))
    # the crossJoin must become a broadcast nested-loop, never a
    # CartesianProduct shuffle of the vector table
    assert rep.cartesian_products == 0, rep.summary()
    assert rep.broadcast_nested_loop >= 1 or rep.broadcast_joins >= 1, rep.summary()


def test_dim_join_broadcasts(spark):
    from fastpyvectordb_spark.suite.analytics import agg_revenue_by_nation

    rep = plan_report(agg_revenue_by_nation(spark, SF))
    assert rep.broadcast_joins >= 1, rep.summary()
    assert rep.cartesian_products == 0


def test_q1_pushes_date_filter_and_codegens(spark):
    from fastpyvectordb_spark.suite.analytics import agg_pricing_summary

    df = agg_pricing_summary(spark, SF)
    rep = assert_scale_safe(df, expect_pushdown=True, max_shuffles=2)
    assert any("l_shipdate" in p for p in rep.pushed_filters)
    # codegen markers only materialize in the FINAL adaptive plan —
    # execute, then re-inspect
    df.collect()
    rep2 = plan_report(df)
    assert rep2.codegen_stages >= 1, rep2.summary()


def test_lsh_probe_pushes_bucket_filter(spark):
    from fastpyvectordb_spark.ann.lsh import add_signatures, hyperplanes

    emb = load_table(spark, SF, "embeddings")
    planes = hyperplanes(64, n_bits=6)
    signed = add_signatures(emb, planes)
    probed = signed.filter(F.col("lsh_sig").isin([1, 2, 3]))
    # derived column: filter evaluates post-scan but must not shuffle
    rep = plan_report(probed)
    assert rep.exchanges == 0, rep.summary()


def test_suite_registration_contract():
    """EVERY suite query carries a DuckDB oracle (round 7: the five
    ann_* queries register their exhaustive-probe forms, provably ==
    exact, with exact-kNN oracles — approximate operating points stay
    recall-gated in tests/test_ann.py); names are unique."""
    from fastpyvectordb_spark import suite

    q = suite.queries()
    o = suite.oracle_sql()
    assert set(o) == set(q), set(q) - set(o)
    assert len(q) >= 127


def test_partitioned_search_is_map_side_plus_takeordered(spark):
    """The partition-local ANN single-query plan must be one map-side
    stage + TakeOrderedAndProject — NO exchange of artifact rows."""
    from fastpyvectordb_spark.ann.partitioned import (
        partitioned_build, partitioned_search,
    )

    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    idx = partitioned_build(emb, n_parts=4, n_lists=8).localCheckpoint()
    plan = partitioned_search(idx, qvec, k=5, nprobe=4)
    rep = plan_report(plan)
    assert rep.exchanges == 0, rep.summary()
    from fastpyvectordb_spark.plans.advisor import physical_plan

    assert "TakeOrderedAndProject" in physical_plan(plan)


def test_dv_read_uses_broadcast_join(spark, tmp_path):
    """The deletion-vector filter must broadcast the (tiny) DV side —
    a shuffled join against kill files would be a scale bug."""
    from fastpyvectordb_spark.catalog import Collection, CollectionConfig
    from fastpyvectordb_spark.plans.advisor import physical_plan

    c = Collection(
        spark, str(tmp_path / "dvplan"), CollectionConfig(dimensions=2, n_buckets=4)
    )
    c.insert_batch(
        spark.createDataFrame(
            [(f"x{i}", [float(i), 0.0]) for i in range(50)],
            "id string, embedding array<float>",
        )
    )
    c.delete(ids=["x1", "x2"])
    plan = physical_plan(c.df())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_q7_broadcasts_both_role_dims(spark):
    """Q7: both nation-role dims broadcast; the fact table never
    shuffles except for the final group-by."""
    from fastpyvectordb_spark.suite.tpch2 import join_volume_shipping_q7

    rep = plan_report(join_volume_shipping_q7(spark, SF))
    assert rep.broadcast_joins >= 2, rep.summary()
    assert rep.cartesian_products == 0


def test_q19_pushes_implied_predicates(spark):
    """Q19: the extracted single-side bounds must reach both parquet
    scans even though the full predicate is an OR across sides."""
    from fastpyvectordb_spark.suite.tpch2 import agg_disjunctive_parts_q19

    df = agg_disjunctive_parts_q19(spark, SF)
    rep = assert_scale_safe(df, expect_pushdown=True)
    assert any("l_quantity" in p for p in rep.pushed_filters), rep.pushed_filters
    assert any("p_brand" in p for p in rep.pushed_filters), rep.pushed_filters
    assert rep.broadcast_joins >= 1, rep.summary()


def test_funnel_is_single_scan(spark):
    """The funnel plan reads the corpus once: a single aggregate, no
    join, no per-stage re-scan."""
    from fastpyvectordb_spark.suite.textanalysis import pipeline_filter_funnel

    rep = plan_report(pipeline_filter_funnel(spark, SF))
    assert rep.broadcast_joins == 0 and rep.sortmerge_joins == 0, rep.summary()
    from fastpyvectordb_spark.plans.advisor import physical_plan

    plan = physical_plan(pipeline_filter_funnel(spark, SF))
    assert plan.count("FileScan") == 1, plan


def test_q2_groupwise_min_stays_broadcast(spark):
    """Q2: the groupwise min is a WINDOW over partkey, not a self-join
    of the aggregate (which sort-merge-joined two derivatives of the
    same rollup); dims broadcast, fact shuffles are the rollup + the
    window repartition only."""
    from fastpyvectordb_spark.suite.tpch3 import join_min_cost_supplier_q2

    rep = plan_report(join_min_cost_supplier_q2(spark, SF))
    assert rep.cartesian_products == 0, rep.summary()
    assert rep.broadcast_joins >= 2, rep.summary()
    assert rep.sortmerge_joins == 0, rep.summary()


def test_q9_pushes_like_and_broadcasts_dims(spark):
    """Q9: the %red% contains-filter reaches the part scan; part and
    supplier⋈nation are broadcast so lineitem only shuffles for the
    lineitem⋈orders equi-join and the final group-by."""
    from fastpyvectordb_spark.suite.tpch3 import agg_product_profit_q9

    df = agg_product_profit_q9(spark, SF)
    rep = assert_scale_safe(df, expect_pushdown=True)
    assert any("p_name" in p for p in rep.pushed_filters), rep.pushed_filters
    assert rep.broadcast_joins >= 2, rep.summary()
    assert rep.cartesian_products == 0


def test_q11_scalar_subquery_is_broadcast_not_collect(spark):
    """Q11: the global-total threshold is a one-row broadcast cross
    join (BroadcastNestedLoop), never a driver collect or a shuffled
    cartesian product."""
    from fastpyvectordb_spark.plans.advisor import physical_plan
    from fastpyvectordb_spark.suite.tpch3 import agg_important_parts_q11

    df = agg_important_parts_q11(spark, SF)
    rep = plan_report(df)
    assert rep.cartesian_products == 0, rep.summary()
    assert rep.broadcast_nested_loop >= 1 or rep.broadcast_joins >= 1, (
        rep.summary()
    )
    # both the grouped view and its total come from ONE lineitem scan
    # shape (the view is not recomputed via a second fact read path
    # with different filters)
    plan = physical_plan(df)
    assert plan.count("CartesianProduct") == 0


def test_q16_exclusion_is_broadcast_anti_join(spark):
    """Q16: the NOT-IN supplier exclusion must be a broadcast anti
    join; the attribute-triple residuals reach the part scan."""
    from fastpyvectordb_spark.plans.advisor import physical_plan
    from fastpyvectordb_spark.suite.tpch3 import agg_supplier_part_counts_q16

    df = agg_supplier_part_counts_q16(spark, SF)
    rep = assert_scale_safe(df, expect_pushdown=True)
    assert any("p_brand" in p and "p_size" in p for p in rep.pushed_filters), (
        rep.pushed_filters
    )
    plan = physical_plan(df)
    assert "Not(EqualTo(p_brand" in plan, plan
    assert rep.broadcast_joins >= 1, rep.summary()
    assert rep.cartesian_products == 0


def test_q20_prefix_like_pushes_to_scan(spark):
    """Q20: the small% prefix filter becomes a StartsWith pushed to
    the part scan; the one-pass conditional aggregate means lineitem
    is read exactly once."""
    from fastpyvectordb_spark.plans.advisor import physical_plan
    from fastpyvectordb_spark.suite.tpch3 import join_promotion_suppliers_q20

    df = join_promotion_suppliers_q20(spark, SF)
    rep = assert_scale_safe(df, expect_pushdown=True)
    assert any("p_name" in p for p in rep.pushed_filters), rep.pushed_filters
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") <= 1, "fact table scanned twice"


def test_q21_single_fact_shuffle(spark):
    """Q21: the EXISTS/NOT-EXISTS decorrelation must NOT self-join
    lineitem — one fact scan, one shuffle on l_orderkey, then
    dimension-sized joins only."""
    from fastpyvectordb_spark.plans.advisor import physical_plan
    from fastpyvectordb_spark.suite.tpch3 import join_waiting_suppliers_q21

    df = join_waiting_suppliers_q21(spark, SF)
    rep = plan_report(df)
    assert rep.cartesian_products == 0, rep.summary()
    assert rep.broadcast_joins >= 1, rep.summary()
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") <= 1, "fact table scanned twice"


def test_bfs_hop_joins_are_sortfree_shuffled_hash(spark):
    """Round 11: every traversal hop used to sort-merge-join the edge
    table — re-sorting it per hop. Now the edge table is src-clustered
    in ONE reusable exchange (dropDuplicates after repartition("src")
    adds no exchange of its own) and the frontier is the shuffled-hash
    build side, so a depth-3 walk carries 3 SHJ, 0 SMJ, 0 Sort."""
    from fastpyvectordb_spark.operators.graph import traverse
    from fastpyvectordb_spark.plans.advisor import physical_plan

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(120)],
        "src string, dst string",
    )
    df = traverse(edges, ["n1"], max_depth=3)
    plan = physical_plan(df)
    # the depth-d output unions hop 1..d steps and hop h's branch
    # re-contains hops 1..h's joins: d(d+1)/2 = 6 join nodes at d=3
    # (exchanges between them dedup at runtime via ReusedExchange)
    assert plan.count("ShuffledHashJoin") == 6, plan
    assert plan.count("SortMergeJoin") == 0, plan
    assert plan.count("Sort ") == 0, plan
