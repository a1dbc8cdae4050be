"""Property-based check of the Filter compiler (reference semantics,
``vectordb_optimized.py:56-184``): random predicate trees over a value
grid that covers every null/type combination must select exactly the
rows a direct Python evaluation of the documented semantics selects —
missing field ⇒ False (for every leaf op, including ne/nin), ``not_``
inverts the evaluated result, and/or combine evaluated children."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fastpyvectordb_spark import filters as Flt

# whole-file slow lane: scale soak / hypothesis property suites
pytestmark = pytest.mark.slow

INTS = [None, 0, 1, 2, 3]
STRS = [None, "a", "b", "ab", "xyz"]
NUMS = [None, 0.5, 1.5, 2.5]


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [
        (i, fi, fs, fn)
        for i, (fi, fs, fn) in enumerate(
            itertools.product(INTS, STRS, NUMS)
        )
    ]
    return spark.createDataFrame(
        rows, "id int, f_int int, f_str string, f_num double"
    ).cache()


def _grid_rows():
    return [
        {"id": i, "f_int": fi, "f_str": fs, "f_num": fn}
        for i, (fi, fs, fn) in enumerate(
            itertools.product(INTS, STRS, NUMS)
        )
    ]


# -- reference-semantics evaluator (independent of the compiler) -------

def _ev(node, row) -> bool:
    kind = node[0]
    if kind == "and":
        return _ev(node[1], row) and _ev(node[2], row)
    if kind == "or":
        return _ev(node[1], row) or _ev(node[2], row)
    if kind == "not":
        return not _ev(node[1], row)
    field, val = node[1], node[2]
    actual = row.get(field)
    if actual is None:
        return False  # the missing-field rule, for EVERY op
    if kind == "eq":
        return actual == val
    if kind == "ne":
        return actual != val
    if kind == "gt":
        return actual > val
    if kind == "gte":
        return actual >= val
    if kind == "lt":
        return actual < val
    if kind == "lte":
        return actual <= val
    if kind == "in":
        return actual in val
    if kind == "nin":
        return actual not in val
    if kind == "contains":
        return val in str(actual)
    raise AssertionError(kind)


def _compile(node) -> Flt.Filter:
    kind = node[0]
    if kind == "and":
        return Flt.and_(_compile(node[1]), _compile(node[2]))
    if kind == "or":
        return Flt.or_(_compile(node[1]), _compile(node[2]))
    if kind == "not":
        return Flt.not_(_compile(node[1]))
    fn = {
        "eq": Flt.eq, "ne": Flt.ne, "gt": Flt.gt, "gte": Flt.gte,
        "lt": Flt.lt, "lte": Flt.lte, "in": Flt.in_, "nin": Flt.nin,
        "contains": Flt.contains,
    }[kind]
    return fn(node[1], node[2])


_leaf = st.one_of(
    st.tuples(
        st.sampled_from(["eq", "ne"]),
        st.just("f_int"),
        st.sampled_from([0, 1, 2, 5]),
    ),
    st.tuples(
        st.sampled_from(["eq", "ne", "contains"]),
        st.just("f_str"),
        st.sampled_from(["a", "b", "ab", "z"]),
    ),
    st.tuples(
        st.sampled_from(["gt", "gte", "lt", "lte"]),
        st.just("f_num"),
        st.sampled_from([0.5, 1.5, 2.5]),
    ),
    st.tuples(
        st.sampled_from(["in", "nin"]),
        st.just("f_int"),
        st.sampled_from([[0], [1, 2], [0, 1, 2, 3]]),
    ),
)

_tree = st.recursive(
    _leaf,
    lambda kids: st.one_of(
        st.tuples(st.just("and"), kids, kids),
        st.tuples(st.just("or"), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=6,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=_tree)
def test_filter_tree_matches_reference_semantics(grid_df, tree):
    got = sorted(
        r["id"] for r in grid_df.filter(_compile(tree).col()).collect()
    )
    want = sorted(r["id"] for r in _grid_rows() if _ev(tree, r))
    assert got == want, f"tree={tree}"
