"""Query registry: one place where operators declare themselves.

Each operator module registers ``(name, spark_fn, oracle_sql)`` via the
``query`` decorator. ``__spark_entry__.py`` re-exports the registry as
the driver contract (``queries()`` / ``oracle_sql()``); tests iterate
it to replicate the driver's DuckDB cross-check locally.

``oracle=None`` marks a genuinely non-SQL-expressible operator
(stateful streaming, iterative algorithms); the driver then records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    # a SQL string, or a zero-arg callable resolved at oracle_sql() time —
    # the lazy form lets a query's oracle compose SQL parts from a module
    # that imports THIS one (e.g. similarity's graded eval reusing audit's
    # rerank chain) without a circular module-load import
    oracle: str | Callable[[], str] | None


REGISTRY: dict[str, Query] = {}


def query(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame operator + its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {
        q.name: q.oracle() if callable(q.oracle) else q.oracle
        for q in REGISTRY.values()
        if q.oracle is not None
    }
