"""Query registry: every analytics operator the engine claims is registered
here with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an equivalent DuckDB oracle SQL string (driver contract in
``__spark_entry__.py``).

Determinism rules (so the driver's order-insensitive value-hash matches):

- Every computed column is aliased identically in Spark and the oracle.
- Monetary/double aggregates are computed in exact DECIMAL(18,2) arithmetic
  on BOTH engines, then cast to DOUBLE — identical bit patterns regardless
  of partial-aggregation order (double summation order differs between
  engines; decimal summation is exact and associative).
- Ratios/averages are derived from those exact sums (sum/count), never from
  the engines' native double ``avg``.
- Scale-2 decimals can never hit a rounding tie when cast from double
  (an exact tie needs an odd multiple of 1/200, which is not a dyadic
  rational), so HALF_UP (Spark) vs round-half-even engines agree.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a Spark query (and its DuckDB oracle) by name."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so registrations run."""
    from kinesis_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        events,
        ingest_ops,
        joins,
        mllib_lsh,
        multimodal,
        scalars,
        setops,
        similarity,
        textstats,
        tpch,
        udf_ops,
        windows,
    )


def get_registry() -> dict[str, Query]:
    load_all_modules()
    return REGISTRY
