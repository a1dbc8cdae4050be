"""Cypher-subset front-end (reference ``graph.py:950-1111`` G14).

Supported grammar (same subset as the reference's SimpleQueryParser):

    MATCH (n:Label {prop: value})                      RETURN n, n.prop
    MATCH (a:L1)-[:TYPE]->(b:L2)                       RETURN a.x, b.y
    MATCH (a)-[:TYPE*1..3]->(b)                        RETURN a, b
    ... WHERE var.prop <op> value                       (=, !=, <>, >, >=, <, <=)

Compilation target is a DataFrame plan over ``nodes``/``edges`` —
node patterns become filtered scans, relationship patterns become
``nodes ⋈ edges ⋈ nodes`` joins, var-length patterns reuse the
iterative traversal operator, WHERE becomes ``filter`` and RETURN a
``select``. The reference executes the same queries against in-memory
dict indexes row-by-row; here Catalyst plans (and distributes) them.

Each bound variable ``v`` contributes namespaced columns
``v__<property>`` plus ``v__id``; RETURN re-aliases to the Cypher
spelling (``v.prop`` / ``v``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NODE_RE = re.compile(r"\(\s*(\w+)\s*(?::\s*(\w+))?\s*(\{[^}]*\})?\s*\)")
# relationship segment between two nodes in a path pattern:
#   forward  -[:TYPE]->  or var-length  -[:TYPE*lo..hi]->
#   reverse  <-[:TYPE]-
_REL_SEG_RE = re.compile(
    r"\s*(?:"
    r"-\s*\[\s*:\s*(\w+)\s*(?:\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\]\s*->"
    r"|<-\s*\[\s*:\s*(\w+)\s*\]\s*-"
    r")\s*"
)
_WHERE_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|!=|<>|>=|<=|>|<)\s*('(?:[^']*)'|\"(?:[^\"]*)\"|-?\d+(?:\.\d+)?)"
)


def _parse_props(s: str | None) -> dict:
    if not s:
        return {}
    out = {}
    pair_re = r"(\w+)\s*:\s*('(?:[^']*)'|\"[^\"]*\"|-?\d+(?:\.\d+)?)"
    for m in re.finditer(pair_re, s):
        out[m.group(1)] = _parse_value(m.group(2))
    # the whole pattern must be consumed by parsed pairs: an
    # unsupported value (true/false/null, $param) silently dropping
    # its filter would return ALL nodes as if it weren't there
    leftover = re.sub(r"[\s,{}]", "", re.sub(pair_re, "", s))
    if leftover:
        raise ValueError(
            f"cannot parse property pattern {s!r} "
            "(string/number values only)"
        )
    return out


def _parse_value(tok: str):
    if tok[0] in "'\"":
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


@dataclass
class CypherPlan:
    df: DataFrame
    variables: list[str]


class CypherCompiler:
    def __init__(self, nodes: DataFrame, edges: DataFrame):
        self.nodes = nodes
        self.edges = edges
        self._prop_cols = [c for c in nodes.columns if c not in ("id", "labels")]

    # -- pattern pieces ----------------------------------------------

    def _bind_node(self, var: str, label: str | None, props: dict) -> DataFrame:
        df = self.nodes
        if label:
            df = df.filter(F.array_contains("labels", label))
        for k, v in props.items():
            df = df.filter(F.coalesce(F.col(k) == F.lit(v), F.lit(False)))
        cols = [F.col("id").alias(f"{var}__id")] + [
            F.col(c).alias(f"{var}__{c}") for c in self._prop_cols
        ]
        return df.select(*cols)

    def _match(self, pattern: str) -> CypherPlan:
        """Compile a path pattern ``(a)-[:X]->(b)<-[:Y]-(c)…`` to a
        left-deep join chain. Each segment joins the edge table (role-
        swapped for reverse arrows); var-length forward segments reuse
        the DataFrame-seeded iterative traversal (no driver collect —
        a loose left pattern at 100× would OOM a collected seed list).
        """
        s = pattern.strip()
        node = _NODE_RE.match(s)
        if not node:
            raise ValueError(f"cannot parse MATCH pattern: {pattern!r}")
        av, al, ap = node.groups()
        variables = [av]
        df = self._bind_node(av, al, _parse_props(ap))
        pos = node.end()
        seg = 0
        while pos < len(s):
            rel = _REL_SEG_RE.match(s, pos)
            if not rel:
                raise ValueError(
                    f"cannot parse relationship at {s[pos:]!r} in {pattern!r}"
                )
            fwd_type, lo, hi, rev_type = rel.groups()
            node = _NODE_RE.match(s, rel.end())
            if not node:
                raise ValueError(
                    f"cannot parse node at {s[rel.end():]!r} in {pattern!r}"
                )
            bv, bl, bp = node.groups()
            if bv in variables:
                raise ValueError(
                    f"variable {bv!r} bound twice (cycles unsupported)"
                )
            pos = node.end()
            b = self._bind_node(bv, bl, _parse_props(bp))
            if rev_type is not None or lo is None:
                etype = rev_type or fwd_type
                src, dst = ("dst", "src") if rev_type else ("src", "dst")
                hop = self.edges.filter(F.col("type") == etype).select(
                    F.col(src).alias(f"_l{seg}"),
                    F.col(dst).alias(f"_r{seg}"),
                )
                df = (
                    df.join(hop, F.col(f"{av}__id") == F.col(f"_l{seg}"))
                    .join(b, F.col(f"_r{seg}") == F.col(f"{bv}__id"))
                    .drop(f"_l{seg}", f"_r{seg}")
                )
            else:
                from fastpyvectordb_spark.operators.graph import traverse_df

                seeds = df.select(
                    F.col(f"{av}__id").alias("start_id")
                ).distinct()
                paths = traverse_df(
                    self.edges, seeds, max_depth=int(hi),
                    edge_type=fwd_type,
                )
                if int(lo) == 0:
                    # Cypher *0.. includes the zero-hop match (b = a);
                    # traverse_df only emits depth ≥ 1
                    paths = paths.unionByName(
                        seeds.select(
                            "start_id",
                            F.col("start_id").alias("end_id"),
                            F.lit(0).alias("depth"),
                            F.col("start_id").alias("path"),
                        )
                    )
                paths = paths.filter(F.col("depth") >= int(lo))
                df = (
                    df.join(paths, F.col(f"{av}__id") == paths.start_id)
                    .join(b, paths.end_id == F.col(f"{bv}__id"))
                    .drop("start_id", "end_id", "depth", "path")
                )
            variables.append(bv)
            av = bv
            seg += 1
        return CypherPlan(df, variables)

    # -- query --------------------------------------------------------

    def query(self, cypher: str) -> DataFrame:
        m = re.search(
            r"MATCH\s+(.+?)(?:\s+WHERE\s+(.+?))?\s+RETURN\s+(.+?)"
            r"(?:\s+ORDER\s+BY\s+(.+?))?(?:\s+LIMIT\s+(\d+))?$",
            cypher.strip(),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse query (need MATCH ... RETURN ...): {cypher!r}")
        pattern, where, ret, order_by, limit = m.groups()
        plan = self._match(pattern)
        df = plan.df

        if where:
            # AND-chains of comparisons only. Anything this subset
            # can't express (OR, NOT, functions) must RAISE — matching
            # just the first comparison would silently return a
            # superset (or, with NOT, the opposite) of the asked-for
            # rows, and every other unsupported construct here raises.
            for conj in re.split(r"\s+AND\s+", where, flags=re.IGNORECASE):
                w = _WHERE_RE.fullmatch(conj.strip())
                if not w:
                    raise ValueError(
                        f"cannot parse WHERE conjunct {conj.strip()!r} "
                        "(AND-chained var.prop <op> literal only)"
                    )
                var, prop, op, val = w.groups()
                c = F.col(f"{var}__{prop}")
                v = F.lit(_parse_value(val))
                pred = {
                    "=": c == v, "!=": c != v, "<>": c != v,
                    ">": c > v, ">=": c >= v, "<": c < v, "<=": c <= v,
                }[op]
                df = df.filter(F.coalesce(pred, F.lit(False)))

        def _item_col(item: str) -> Column:
            if "." in item:
                var, prop = item.split(".", 1)
                return F.col(f"{var}__{prop}").alias(item)
            return F.col(f"{item}__id").alias(item)

        # RETURN list: plain items, plus count(*) / count(x) aggregates.
        # Any plain item alongside an aggregate becomes a group key
        # (Cypher's implicit grouping).
        items = [s.strip() for s in ret.split(",")]
        agg_cols, key_items = [], []
        for item in items:
            cm = re.fullmatch(r"count\s*\(\s*(\*|[A-Za-z_][\w.]*)\s*\)",
                              item, re.IGNORECASE)
            if cm:
                tgt = cm.group(1)
                src = F.lit(1) if tgt == "*" else _item_col(tgt)
                agg_cols.append(F.count(src).alias(item.replace(" ", "")))
            else:
                key_items.append(item)
        if agg_cols:
            keys = [_item_col(i) for i in key_items]
            df = (
                df.groupBy(*keys).agg(*agg_cols)
                if keys
                else df.agg(*agg_cols)
            )
        else:
            df = df.select(*[_item_col(i) for i in key_items])

        if order_by:
            sort_cols = []
            for part in [s.strip() for s in order_by.split(",")]:
                om = re.fullmatch(r"(.+?)(?:\s+(ASC|DESC))?", part,
                                  re.IGNORECASE)
                expr, direction = om.group(1).strip(), (om.group(2) or "ASC")
                name = expr.replace(" ", "")
                if name not in df.columns:
                    raise ValueError(
                        f"ORDER BY item {expr!r} must appear in RETURN"
                    )
                col = F.col(f"`{name}`")  # backticks: aliases contain '.'
                sort_cols.append(
                    col.desc() if direction.upper() == "DESC" else col.asc()
                )
            df = df.orderBy(*sort_cols)
        if limit:
            df = df.limit(int(limit))
        return df


def cypher_query(nodes: DataFrame, edges: DataFrame, query: str) -> DataFrame:
    """G14 entry point: execute a Cypher-subset query over a graph."""
    return CypherCompiler(nodes, edges).query(query)
