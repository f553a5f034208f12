"""Query registry.

Every operator registers a named query (spark, sf_dir) -> DataFrame plus, when
SQL-expressible, the equivalent DuckDB oracle SQL over the driver's
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings). __spark_entry__.py and bench.py read this
registry; tests iterate it to replicate the driver's Spark-vs-DuckDB check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None          # DuckDB SQL, or None -> rows-only check
    bench: bool = False                # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, *, bench: bool = False,
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, bench, tags)
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    # Import operator modules for their registration side effects.
    from . import operators  # noqa: F401
    return QUERIES
