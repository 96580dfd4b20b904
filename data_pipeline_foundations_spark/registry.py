"""Query registry.

Every operator in SURVEY.md §2 (and every extension operator) registers a
named query here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when
the semantics are SQL-expressible, the equivalent ANSI SQL the DuckDB oracle
runs over the same parquet tables. ``__spark_entry__`` simply re-exports this
registry.

Cross-engine determinism contract (applies to every registered pair):
  - Float *aggregates* are computed in exact integer arithmetic (sum of
    ``cast(round(x*100) as bigint)`` cents) then divided back to double, so
    Spark's and DuckDB's different reduction orders cannot produce last-ulp
    drift. Row-level double arithmetic (same IEEE ops in the same order) is
    bit-stable across engines and used freely.
  - Every ranking/limit orders by a full deterministic key (ties broken by a
    unique column).
  - Column names are aliased identically on both sides (the driver sorts
    columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the same tables; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name`` with its DuckDB oracle SQL."""
    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                    doc=doc or (fn.__doc__ or ""))
        return fn
    return wrap


def all_queries() -> dict[str, QuerySpec]:
    """Import all plan modules (side effect: registration) and return the map."""
    from .plans import load_all  # local import avoids a cycle
    load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
