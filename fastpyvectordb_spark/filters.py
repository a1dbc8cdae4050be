"""Filter expression compiler (reference ``vectordb_optimized.py:56-184``).

The reference's ``Filter`` is a closure tree evaluated per-row against
a metadata dict. Here a filter *compiles to a Catalyst Column* so it
participates in pushdown/pruning — while preserving the reference's
non-standard null semantics:

**missing field ⇒ condition is False — including ``ne``**
(``vectordb_optimized.py:79-81``). Spark comparisons on NULL yield
NULL (dropped by filter, which matches "False") but ``~isin`` /
negations would yield NULL too where the reference says False, so
every leaf is wrapped in ``coalesce(pred, false)`` and ``not_`` is
applied *outside* that wrapper: the reference's ``not_`` inverts the
sub-filter's already-evaluated boolean, so a missing-field leaf
evaluates False and its negation is TRUE —
``not_(f) = NOT coalesce(raw(f), false)``. Truth tables (incl. this
tri-state case) pinned in tests/test_filters.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class Filter:
    """A compiled filter: ``col()`` yields the strict two-valued Column
    (missing ⇒ False); ``raw()`` the tri-state one (missing ⇒ NULL)."""

    _raw: Callable[[], Column]

    def raw(self) -> Column:
        return self._raw()

    def col(self) -> Column:
        return F.coalesce(self._raw(), F.lit(False))

    # combinators (F5)
    def __and__(self, other: "Filter") -> "Filter":
        return Filter(lambda: self.col() & other.col())

    def __or__(self, other: "Filter") -> "Filter":
        return Filter(lambda: self.col() | other.col())

    def __invert__(self) -> "Filter":
        # reference not_: inverts the sub-filter's *evaluated* result;
        # a missing-field leaf evaluates False, so its negation is True
        return Filter(lambda: ~self.col())


def _leaf(fn: Callable[[], Column]) -> Filter:
    return Filter(fn)


def eq(field: str, value: Any) -> Filter:
    return _leaf(lambda: F.col(field) == F.lit(value))


def ne(field: str, value: Any) -> Filter:
    # missing field ⇒ False even for ne (ref :79-81): the raw NULL
    # comparison collapses to False via col()'s coalesce
    return _leaf(lambda: F.col(field) != F.lit(value))


def gt(field: str, value: Any) -> Filter:
    return _leaf(lambda: F.col(field) > F.lit(value))


def gte(field: str, value: Any) -> Filter:
    return _leaf(lambda: F.col(field) >= F.lit(value))


def lt(field: str, value: Any) -> Filter:
    return _leaf(lambda: F.col(field) < F.lit(value))


def lte(field: str, value: Any) -> Filter:
    return _leaf(lambda: F.col(field) <= F.lit(value))


def in_(field: str, values: list) -> Filter:
    return _leaf(lambda: F.col(field).isin(values))


def nin(field: str, values: list) -> Filter:
    # "actual not in expected": NULL isin gives NULL → coalesce False,
    # matching the reference's missing ⇒ False
    return _leaf(lambda: ~F.col(field).isin(values))


def contains(field: str, substring: str) -> Filter:
    return _leaf(lambda: F.col(field).cast("string").contains(substring))


def regex(field: str, pattern: str) -> Filter:
    # reference uses re.search (unanchored) — rlike is also unanchored
    return _leaf(lambda: F.col(field).cast("string").rlike(pattern))


def and_(*filters: Filter) -> Filter:
    out = filters[0]
    for f in filters[1:]:
        out = out & f
    return out


def or_(*filters: Filter) -> Filter:
    out = filters[0]
    for f in filters[1:]:
        out = out | f
    return out


def not_(f: Filter) -> Filter:
    return ~f


def between(field: str, lo: Any, hi: Any) -> Filter:
    """F10: (min,max) range sugar → gte AND lte."""
    return gte(field, lo) & lte(field, hi)


def from_dict(d: dict[str, Any] | None) -> Filter:
    """F6: dict → AND of equalities; empty/None ⇒ always-true."""
    if not d:
        return Filter(lambda: F.lit(True))
    return and_(*[eq(k, v) for k, v in d.items()])


def udf_filter(fn: Callable[[dict], bool], fields: list[str]) -> Filter:
    """F8 escape hatch: arbitrary Python predicate over a struct of the
    named fields. Row-at-a-time Python — documented as the slow path;
    prefer the expression combinators above."""
    from pyspark.sql.types import BooleanType

    @F.udf(returnType=BooleanType())
    def _apply(row):
        meta = {k: v for k, v in row.asDict().items() if v is not None}
        return bool(fn(meta))

    return Filter(lambda: _apply(F.struct(*[F.col(f) for f in fields])))
