"""Query catalog: the single registry behind ``__spark_entry__`` and bench.

Every operator from SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with an ANSI
SQL oracle string that DuckDB can run on the same parquet views. The driver
compares Spark vs oracle (row count + schema + order-insensitive value
hash), so:

- every computed column is explicitly aliased identically on both sides,
- floating aggregates are rounded (ROUND(x, 4)) on both sides so summation
  order (Spark partial aggregation vs DuckDB) can't flip the hash,
- integer sums are CAST to BIGINT in the oracle (DuckDB sums INTEGER into
  HUGEINT; Spark sums into LONG),
- top-k queries carry a deterministic tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline run
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a query into the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tuple(tags),
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_catalog() -> dict[str, QuerySpec]:
    """Import all plan modules (side effect: they register) and return the catalog."""
    from .plans import (  # noqa: F401
        billing,
        curation,
        extensions,
        ml,
        relational,
        scalar_queries,
        sql_api,
        stats,
        streaming_queries,
        temporal_joins,
        timeseries,
        tpch_extra,
    )

    return QUERIES
