"""Data-quality validation: one-pass rule counting, null-is-violation
semantics, and the violating-rows drill-down."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_spark.quality import validate, violating_rows


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -3.0, "B"), (3, None, "A"), (4, 7.0, None)],
        "id BIGINT, amount DOUBLE, code STRING",
    )


def _rules():
    # built lazily: classic-mode Column creation needs an active context
    return {
        "amount_positive": F.col("amount") > 0,
        "code_known": F.col("code").isin("A", "B"),
    }


def test_validate_counts_nulls_as_violations(frame):
    got = {r.rule: (r.n_rows, r.n_violations) for r in validate(frame, _rules()).collect()}
    # amount: -3 fails, NULL fails (unknown is not good) -> 2
    # code: NULL fails -> 1
    assert got == {"amount_positive": (4, 2), "code_known": (4, 1)}
    rates = {r.rule: r.pass_rate for r in validate(frame, _rules()).collect()}
    assert rates == {"amount_positive": 0.5, "code_known": 0.75}


def test_validate_is_single_pass(frame):
    import contextlib
    import io

    df = validate(frame, _rules())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # one scan, one aggregate chain - never a job per rule
    assert plan.count("Scan ") == 2  # tree + node detail print
    assert "Join" not in plan


def test_violating_rows_drilldown(frame):
    rows = {r.id: sorted(r.failed_rules) for r in violating_rows(frame, _rules()).collect()}
    assert rows == {2: ["amount_positive"], 3: ["amount_positive"], 4: ["code_known"]}


def test_empty_rules_rejected(frame):
    with pytest.raises(ValueError):
        validate(frame, {})
    with pytest.raises(ValueError):
        violating_rows(frame, {})


def test_rule_named_n_rows_does_not_collide(frame):
    got = {r.rule: r.n_violations for r in validate(
        frame, {"n_rows": F.col("amount") > 0, "rule": F.col("code").isin("A", "B")}
    ).collect()}
    assert got == {"n_rows": 2, "rule": 1}


def test_validate_empty_input_zero_violations(spark):
    empty = spark.createDataFrame([], "amount DOUBLE")
    rows = validate(empty, {"pos": F.col("amount") > 0}).collect()
    assert [(r.n_rows, r.n_violations, r.pass_rate) for r in rows] == [(0, 0, 1.0)]
