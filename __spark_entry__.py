"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``kinesis_spark.queries`` — the registry owns every
(Spark callable, DuckDB oracle) pair; this file just re-exposes them in the
driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis_spark.queries import get_registry, get_registry_ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end LLM data-prep pipeline (language/
    quality gate → exact dedup → MinHash-LSH near-dup → corpus rollup)
    in one single-scan plan, at sf0.001."""
    reg = get_registry()
    return reg["p1_llm_prep_pipeline"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered so the correctness driver's per-round window rotates across
    # rounds: round-1-unverified families first (see queries/__init__.py).
    return {name: q.spark_fn for name, q in get_registry_ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in get_registry_ordered().items()
        if q.oracle is not None
    }
