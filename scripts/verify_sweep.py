#!/usr/bin/env python
"""The /verify recipe as a runnable script: drive __spark_entry__.entry,
then every queries() entry at sf0.01 against its oracle_sql() twin via
DuckDB (bit-exact compare, float columns included). PASS = every
oracle-backed query prints EXACT MATCH and FAILURES is empty."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import duckdb

import __spark_entry__ as e
from kinesis_spark.session import get_spark


def main() -> int:
    spark = get_spark("verify-drive")
    spark.sparkContext.setLogLevel("ERROR")
    assert len(e.entry(spark).collect()) > 0

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        try:
            got = fn(spark, sf).toPandas()
            if name not in osql:
                print(name, "rows-only", len(got), flush=True)
                continue
            want = con.execute(osql[name]).fetchdf()
            cols = sorted(got.columns)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(
                sorted(want.columns)
            ).reset_index(drop=True)
            assert list(g.columns) == list(w.columns) and len(g) == len(w), name
            for c in cols:
                gv, wv = g[c], w[c]
                ok = (
                    (gv.astype(str).values == wv.astype(str).values)
                    if gv.dtype.kind != "f"
                    else ((gv.values == wv.values) | (gv.isna() & wv.isna()).values)
                )
                assert ok.all(), (name, c)
            print(name, "EXACT MATCH", len(g), flush=True)
        except Exception as ex:  # noqa: BLE001 - collect, report all
            fails.append(name)
            print(name, "FAIL", repr(ex)[:200], flush=True)
    print("FAILURES:", fails, flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
