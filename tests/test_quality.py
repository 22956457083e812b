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


def test_dq2_approx_mode_drops_expand_and_bounds_error(spark, sf_dir):
    """The 100 TB profile mode: approx_count_distinct must compile
    WITHOUT the Expand operator (the exact multi-distinct's N-way row
    replication) and land within HLL++ error (5% rsd default, allow 15%)
    of the exact counts; every non-distinct stat stays identical."""
    import contextlib
    import io

    from kinesis_spark.queries.lineage import dq2_column_profile

    exact = dq2_column_profile(spark, sf_dir).collect()
    approx_df = dq2_column_profile(spark, sf_dir, exact=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx_df.explain("formatted")
    assert "Expand" not in buf.getvalue()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dq2_column_profile(spark, sf_dir).explain("formatted")
    assert "Expand" in buf.getvalue()  # the cost approx mode removes

    e = {r.col_name: r for r in exact}
    for r in approx_df.collect():
        x = e[r.col_name]
        assert (r.n_rows, r.n_null, r.min_val, r.max_val) == (
            x.n_rows,
            x.n_null,
            x.min_val,
            x.max_val,
        )
        assert abs(r.n_distinct - x.n_distinct) <= max(1, 0.15 * x.n_distinct), (
            r.col_name,
            r.n_distinct,
            x.n_distinct,
        )


def test_dq4_psi_flags_genuine_drift(spark, tmp_path):
    """dq4's alert path, exercised with genuinely drifted data: the
    current slice's prices shift one bin up, so PSI crosses the 0.2
    convention and the alert fires — checked bit-exactly against the
    same oracle SQL on the synthetic table. (On the fixture corpus
    prices are date-independent, so the registered run's PSI is near
    zero with the alert off — the no-drift baseline.)"""
    import datetime

    import duckdb

    from kinesis_spark.queries import get_registry

    rows = []
    for i in range(2000):
        year = 1995 + (i % 7)
        # pre-split years cluster low; post-split years shift up 100k
        base = 25_000.0 + (i % 5) * 50_000.0
        price = base if year < 1998 else base + 100_000.0
        rows.append((i, price, datetime.datetime(year, 1 + i % 12, 1)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    q = get_registry()["dq4_psi_drift"]
    got = q.spark_fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
        )
        want = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    cols = sorted(got.columns)
    g = got[cols].sort_values("bin").reset_index(drop=True)
    w = want[cols].sort_values("bin").reset_index(drop=True)
    assert len(g) == len(w) == 10
    for c in cols:
        gv, wv = g[c], w[c]
        ok = (
            (gv.values == wv.values)
            if gv.dtype.kind == "f"
            else (gv.astype(str).values == wv.astype(str).values)
        )
        assert ok.all(), c
    assert g["psi_total"].iloc[0] > 0.2
    assert bool(g["drift_alert"].iloc[0]) is True
