"""Fast syntactic gate over every registered oracle: DuckDB must PLAN
each one against the fixture views. Catches SQL typos, engine-dialect
slips, and schema drift in seconds — the full value-comparison sweep
(verify skill / driver gate) stays the authority, this is the
fail-fast front door for future edits."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_spark.queries import get_registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield c
    c.close()


def test_every_oracle_plans(con):
    bad = []
    for name, q in get_registry().items():
        if q.oracle is None:
            continue
        try:
            con.execute("EXPLAIN " + q.oracle)
        except Exception as exc:  # noqa: BLE001 — collect, report all
            bad.append((name, str(exc).splitlines()[0][:160]))
    assert not bad, bad


def test_every_query_has_spark_callable_and_tags(con):
    reg = get_registry()
    assert len(reg) >= 191
    for name, q in reg.items():
        assert callable(q.spark_fn), name
        assert q.tags, name  # every query self-describes for the catalog
