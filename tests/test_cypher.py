"""Cypher-subset front-end tests (G14, graph.py:950-1111 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.cypher import cypher_query


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("p1", ["Person"], "Alice", 30),
            ("p2", ["Person"], "Bob", 25),
            ("p3", ["Person"], "Carol", 35),
            ("c1", ["Company"], "Acme", None),
            ("c2", ["Company"], "Globex", None),
            ("t1", ["City"], "Springfield", None),
            ("t2", ["City"], "Shelbyville", None),
        ],
        "id string, labels array<string>, name string, age int",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "p1", "c1", "WORKS_AT"),
            ("e2", "p2", "c1", "WORKS_AT"),
            ("e3", "p3", "c2", "WORKS_AT"),
            ("e4", "p1", "p2", "KNOWS"),
            ("e5", "p2", "p3", "KNOWS"),
            ("e6", "c1", "t1", "BASED_IN"),
            ("e7", "c2", "t2", "BASED_IN"),
        ],
        "id string, src string, dst string, type string",
    )
    return nodes, edges


def test_node_match_by_label(graph):
    n, e = graph
    rows = cypher_query(n, e, "MATCH (p:Person) RETURN p.name").collect()
    assert {r["p.name"] for r in rows} == {"Alice", "Bob", "Carol"}


def test_node_match_with_props(graph):
    n, e = graph
    rows = cypher_query(n, e, "MATCH (p:Person {name: 'Bob'}) RETURN p, p.age").collect()
    assert len(rows) == 1
    assert rows[0]["p"] == "p2" and rows[0]["p.age"] == 25


def test_relationship_match(graph):
    n, e = graph
    rows = cypher_query(
        n, e, "MATCH (p:Person)-[:WORKS_AT]->(c:Company) RETURN p.name, c.name"
    ).collect()
    got = {(r["p.name"], r["c.name"]) for r in rows}
    assert got == {("Alice", "Acme"), ("Bob", "Acme"), ("Carol", "Globex")}


def test_where_clause(graph):
    n, e = graph
    rows = cypher_query(
        n,
        e,
        "MATCH (p:Person)-[:WORKS_AT]->(c:Company) WHERE p.age > 26 RETURN p.name",
    ).collect()
    assert {r["p.name"] for r in rows} == {"Alice", "Carol"}


def test_where_string_eq(graph):
    n, e = graph
    rows = cypher_query(
        n, e, "MATCH (p:Person) WHERE p.name = 'Carol' RETURN p.age"
    ).collect()
    assert [r["p.age"] for r in rows] == [35]


def test_var_length_path(graph):
    n, e = graph
    rows = cypher_query(
        n, e, "MATCH (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(b:Person) RETURN b.name"
    ).collect()
    assert {r["b.name"] for r in rows} == {"Bob", "Carol"}


def test_unparseable_raises(graph):
    n, e = graph
    with pytest.raises(ValueError, match="cannot parse"):
        cypher_query(n, e, "FETCH ALL THE THINGS")


def test_var_length_unselective_left_pattern(graph):
    """A loose left pattern (every Person seeds the traversal) must
    work without collecting seed ids to the driver — the var-length
    frontier starts as a DataFrame join (traverse_df)."""
    n, e = graph
    rows = cypher_query(
        n, e, "MATCH (a:Person)-[:KNOWS*1..2]->(b:Person) RETURN a.name, b.name"
    ).collect()
    pairs = {(r["a.name"], r["b.name"]) for r in rows}
    assert pairs == {
        ("Alice", "Bob"), ("Alice", "Carol"), ("Bob", "Carol"),
    }


def test_traverse_df_matches_traverse(graph):
    from fastpyvectordb_spark.operators.graph import traverse, traverse_df

    n, e = graph
    by_list = traverse(e, ["p1", "p2"], max_depth=2, edge_type="KNOWS")
    seeds = n.filter(F.col("id").isin(["p1", "p2"])).select(
        F.col("id").alias("start_id")
    )
    by_df = traverse_df(e, seeds, max_depth=2, edge_type="KNOWS")
    key = lambda r: (r["start_id"], r["end_id"], r["depth"], r["path"])
    assert sorted(map(key, by_list.collect())) == sorted(map(key, by_df.collect()))


def test_cypher_count_star_and_grouped(spark, graph):
    nodes, edges = graph
    one = cypher_query(nodes, edges, "MATCH (p:Person) RETURN count(*)").collect()
    assert len(one) == 1 and one[0]["count(*)"] == 3

    grouped = cypher_query(
        nodes, edges,
        "MATCH (p:Person)-[:WORKS_AT]->(c:Company) "
        "RETURN c.name, count(p) ORDER BY count(p) DESC, c.name LIMIT 2",
    ).collect()
    assert [(r["c.name"], r["count(p)"]) for r in grouped] == [
        ("Acme", 2), ("Globex", 1)
    ]


def test_cypher_order_by_limit_plain(spark, graph):
    nodes, edges = graph
    rows = cypher_query(
        nodes, edges,
        "MATCH (p:Person) RETURN p.name ORDER BY p.name DESC LIMIT 2",
    ).collect()
    assert [r["p.name"] for r in rows] == ["Carol", "Bob"]


def test_cypher_order_by_requires_returned_item(spark, graph):
    nodes, edges = graph
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ORDER BY"):
        cypher_query(
            nodes, edges,
            "MATCH (p:Person) RETURN p.name ORDER BY p.age",
        )


def test_cypher_chain_pattern(spark, graph):
    nodes, edges = graph
    rows = cypher_query(
        nodes, edges,
        "MATCH (p:Person)-[:WORKS_AT]->(c:Company)-[:BASED_IN]->(ct:City) "
        "RETURN p.name, c.name, ct.name ORDER BY p.name",
    ).collect()
    assert [(r["p.name"], r["c.name"], r["ct.name"]) for r in rows] == [
        ("Alice", "Acme", "Springfield"),
        ("Bob", "Acme", "Springfield"),
        ("Carol", "Globex", "Shelbyville"),
    ]


def test_cypher_reverse_direction(spark, graph):
    nodes, edges = graph
    fwd = cypher_query(
        nodes, edges,
        "MATCH (p:Person)-[:WORKS_AT]->(c:Company) RETURN p.name, c.name",
    ).collect()
    rev = cypher_query(
        nodes, edges,
        "MATCH (c:Company)<-[:WORKS_AT]-(p:Person) RETURN p.name, c.name",
    ).collect()
    key = lambda r: (r["p.name"], r["c.name"])
    assert sorted(map(key, fwd)) == sorted(map(key, rev))


def test_cypher_chain_with_varlength_segment(spark, graph):
    nodes, edges = graph
    # var-length KNOWS then a single WORKS_AT hop off the endpoint
    rows = cypher_query(
        nodes, edges,
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(b)-[:WORKS_AT]->(c) "
        "RETURN b.name, c.name ORDER BY b.name",
    ).collect()
    assert all(r["c.name"] in ("Acme", "Globex") for r in rows)
    assert len(rows) >= 1


def test_cypher_rejects_cyclic_rebinding(spark, graph):
    nodes, edges = graph
    import pytest as _pytest
    with _pytest.raises(ValueError, match="twice"):
        cypher_query(
            nodes, edges,
            "MATCH (a:Person)-[:KNOWS]->(a) RETURN a",
        )


def test_where_and_chain(graph):
    nodes, edges = graph
    rows = cypher_query(
        nodes, edges,
        "MATCH (a:Person) WHERE a.age > 24 AND a.name = 'Bob' RETURN a.name",
    ).collect()
    assert [r["a.name"] for r in rows] == ["Bob"]


def test_where_unsupported_constructs_raise(graph):
    nodes, edges = graph
    # silently applying only the first conjunct (or inverting NOT)
    # would return wrong rows — these must raise
    with pytest.raises(ValueError, match="WHERE conjunct"):
        cypher_query(nodes, edges,
                     "MATCH (a:Person) WHERE a.age > 24 OR a.age < 10 RETURN a")
    with pytest.raises(ValueError, match="WHERE conjunct"):
        cypher_query(nodes, edges,
                     "MATCH (a:Person) WHERE NOT a.age = 30 RETURN a")


def test_unsupported_prop_value_raises(graph):
    nodes, edges = graph
    with pytest.raises(ValueError, match="property pattern"):
        cypher_query(nodes, edges, "MATCH (a:Person {active: true}) RETURN a")


def test_var_length_zero_hop(graph):
    nodes, edges = graph
    # *0..1 includes the zero-hop match (b = a) per Cypher semantics
    rows = cypher_query(
        nodes, edges,
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS*0..1]->(b) RETURN b.name",
    ).collect()
    names = sorted(r["b.name"] for r in rows)
    assert names == ["Alice", "Bob"]  # depth 0 (self) + depth 1
