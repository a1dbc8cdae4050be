"""Pin the reference Filter truth tables, esp. missing-field ⇒ False
(vectordb_optimized.py:79-81) including ne, and not_ inversion."""

from __future__ import annotations

import pytest

from fastpyvectordb_spark import filters as Flt


@pytest.fixture(scope="module")
def meta_df(spark):
    # row 2 has category NULL == "missing field"
    return spark.createDataFrame(
        [
            (1, "A", 5.0, "hello world"),
            (2, None, 7.0, "spark"),
            (3, "B", None, None),
        ],
        "id int, category string, value double, text string",
    )


def _ids(df, f):
    return sorted(r["id"] for r in df.filter(f.col()).collect())


def test_eq_and_missing(meta_df):
    assert _ids(meta_df, Flt.eq("category", "A")) == [1]


def test_ne_missing_is_false(meta_df):
    # reference: ne on missing field ⇒ False (row 2 excluded!)
    assert _ids(meta_df, Flt.ne("category", "A")) == [3]


def test_not_eq_includes_missing(meta_df):
    # reference not_: inverts evaluated result; eq(missing)=False ⇒ True
    assert _ids(meta_df, Flt.not_(Flt.eq("category", "A"))) == [2, 3]


def test_comparisons(meta_df):
    assert _ids(meta_df, Flt.gt("value", 5.0)) == [2]
    assert _ids(meta_df, Flt.gte("value", 5.0)) == [1, 2]
    assert _ids(meta_df, Flt.lt("value", 6.0)) == [1]
    assert _ids(meta_df, Flt.lte("value", 7.0)) == [1, 2]


def test_in_nin(meta_df):
    assert _ids(meta_df, Flt.in_("category", ["A", "B"])) == [1, 3]
    # nin on missing field ⇒ False (row 2 excluded)
    assert _ids(meta_df, Flt.nin("category", ["A"])) == [3]


def test_contains_regex(meta_df):
    assert _ids(meta_df, Flt.contains("text", "world")) == [1]
    assert _ids(meta_df, Flt.regex("text", "sp.rk")) == [2]
    # unanchored like re.search
    assert _ids(meta_df, Flt.regex("text", "orld")) == [1]


def test_combinators(meta_df):
    f = Flt.and_(Flt.eq("category", "A"), Flt.gt("value", 1.0))
    assert _ids(meta_df, f) == [1]
    g = Flt.or_(Flt.eq("category", "B"), Flt.eq("category", "A"))
    assert _ids(meta_df, g) == [1, 3]


def test_from_dict(meta_df):
    assert _ids(meta_df, Flt.from_dict({"category": "A", "value": 5.0})) == [1]
    assert _ids(meta_df, Flt.from_dict({})) == [1, 2, 3]
    assert _ids(meta_df, Flt.from_dict(None)) == [1, 2, 3]


def test_between(meta_df):
    assert _ids(meta_df, Flt.between("value", 5.0, 7.0)) == [1, 2]


def test_udf_filter_escape_hatch(meta_df):
    f = Flt.udf_filter(
        lambda m: m.get("category") == "A" or m.get("value", 0) > 6,
        ["category", "value"],
    )
    assert _ids(meta_df, f) == [1, 2]
