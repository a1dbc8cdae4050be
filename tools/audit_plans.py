"""Physical-plan audit over the whole suite (SURVEY §4 discipline).

For every registered query, print the advisor's summary and flag the
scale hazards that matter at 100 TB:

- ``CartesianProduct`` (never acceptable without an explicit tiny side)
- ``SortMergeJoin`` where a broadcastable side exists (full-outer joins
  are exempt — Spark cannot broadcast them, and the fusion sets are
  k-sized)
- ``BroadcastNestedLoopJoin`` with a >1-row build side (the 1-row case
  is the idiomatic scalar-attach crossJoin and is whitelisted)
- unusually deep exchange chains (iterative BFS hops are expected and
  capped; anything else deserves a look)

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit code 1 if any non-whitelisted hazard is found.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# full-outer fusion joins can't broadcast; BFS loops are exchange-deep
# by construction — reviewed and accepted. hybrid_search_batch adds the
# doc_id-keyed postings ⋈ doc_lengths join (large-large at 100 TB —
# co-partitioned/bucketed in production, never broadcast) and runs both
# fusion sides in one pipeline, so its exchange count is the sum of the
# two sides' (rows on the merge path stay bounded by queries × k × 5).
EXPECTED_SMJ = {
    "hybrid_search_alpha05",
    "hybrid_search_alpha08",
    "hybrid_search_batch",
    # large-large self-joins where no side is broadcastable at scale:
    # PageRank's ranks ⋈ edges per iteration, triangle counting's
    # edges ⋈ edges two-hop enumeration — SMJ is the CORRECT physical
    # choice there (both are the GraphX/production shapes).
    "graph_pagerank_top20",
    "graph_triangles_topk",
}
EXPECTED_DEEP = {
    "graph_traverse",
    "gv_traverse_rerank",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "hybrid_search_batch",
    # iterative / staged by construction: triangle enumeration expands
    # the canonical two-join plan; the conversion funnel is four
    # sequential stage-joins (rows shrink monotonically stage to
    # stage, all keyed on user_id) plus one-row count attaches.
    "graph_triangles_topk",
    "events_conversion_funnel",
}
DEEP_THRESHOLD = 12


def main() -> int:
    from fastpyvectordb_spark.session import get_spark
    from fastpyvectordb_spark.plans.advisor import plan_report
    from fastpyvectordb_spark import suite

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    spark = get_spark("planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = suite.queries()
    names = args or sorted(qs)
    n_hazards = 0
    for name in names:
        try:
            rep = plan_report(qs[name](spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — audit must visit every query
            print(f"{name:32s} ERROR {type(ex).__name__}: {ex}", flush=True)
            n_hazards += 1
            continue
        hazards = []
        if rep.cartesian_products:
            hazards.append(f"CARTESIAN x{rep.cartesian_products}")
        if rep.sortmerge_joins and name not in EXPECTED_SMJ:
            hazards.append(f"SMJ x{rep.sortmerge_joins}")
        if rep.exchanges > DEEP_THRESHOLD and name not in EXPECTED_DEEP:
            hazards.append(f"exchanges={rep.exchanges}")
        mark = "   << " + ", ".join(hazards) if hazards else ""
        print(f"{name:32s} {rep.summary()}{mark}", flush=True)
        n_hazards += len(hazards)
    print(f"\n{n_hazards} hazard(s)")
    return 1 if n_hazards else 0


if __name__ == "__main__":
    raise SystemExit(main())
