"""Data-quality validation: declarative rule checks over a DataFrame in
ONE aggregation pass — the expectations/constraints stage every
production pipeline runs between ingest and publish.

A rule is ``(name, Column predicate)``; ``validate`` counts violations
per rule with conditional aggregates, so checking 50 rules over 100 TB
costs one scan and one scalar-sized shuffle (each task emits one row of
rule counters) — never one job per rule, and never a row-level
materialization of violations. ``violating_rows`` exists for the drill-
down path and is intentionally a separate, filtered scan.

Referential rules (foreign key exists in a dim) are expressed by the
caller as an anti-join count — see ``dq1_validation_rules``
(queries/lineage.py) for the registry-facing composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Check every rule in one aggregation pass.

    ``rules`` maps rule name → predicate Column that is TRUE for GOOD
    rows. Returns one row per rule: ``(rule, n_rows, n_violations,
    pass_rate)`` — n_violations counts rows where the predicate is
    false OR null (a null check result is a violation: unknown is not
    good).
    """
    if not rules:
        raise ValueError("validate() needs at least one rule")
    # positional internal aliases: rule names are user data and must not
    # collide with n_rows or each other's aggregate columns
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("_dq_n_rows")]
    for i, pred in enumerate(rules.values()):
        aggs.append(
            F.coalesce(  # empty input: 0 violations, not NULL
                F.sum(F.when(pred.isNull() | ~pred, 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias(f"_dq_{i}")
        )
    wide = df.agg(*aggs)
    # unpivot the one wide row into (rule, n_violations) rows
    stacked = wide.select(
        F.col("_dq_n_rows").alias("n_rows"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in names]),
                F.array(*[F.col(f"_dq_{i}") for i in range(len(names))]),
            )
        ).alias("rule", "n_violations"),
    )
    return stacked.select(
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "n_violations",
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(1.0 - F.col("n_violations") / F.col("n_rows"))
        .alias("pass_rate"),
    )


def violating_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Drill-down: the rows failing ANY rule, with the list of failed
    rule names attached (filtered scan; use after ``validate`` flags a
    problem, not as the routine check)."""
    if not rules:
        raise ValueError("violating_rows() needs at least one rule")
    if "failed_rules" in df.columns:
        # withColumn would silently clobber it (validate() uses
        # collision-proof _dq_ aliases for the same reason)
        raise ValueError(
            "input already has a 'failed_rules' column; rename it before "
            "calling violating_rows()"
        )
    failed = F.filter(
        F.array(
            *[
                F.when(pred.isNull() | ~pred, F.lit(name))
                for name, pred in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("failed_rules", failed).filter(
        F.size("failed_rules") > 0
    )
