#!/usr/bin/env python
"""The /verify recipe as a runnable script: drive __spark_entry__.entry,
then every queries() entry at sf0.01 against its oracle_sql() twin —
through tests/oracle_utils (the SAME comparator the pytest gate uses:
dtype-kind asserts, bit-exact float compare, targeted diagnostics), so
the script and the test gate can never drift. PASS = every oracle-backed
query prints EXACT MATCH and FAILURES is empty (exit 0)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import __spark_entry__ as e
from kinesis_spark.pins import release_shared_pins
from kinesis_spark.session import get_spark
from oracle_utils import compare, run_oracle


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("verify-drive")
    spark.sparkContext.setLogLevel("ERROR")
    assert len(e.entry(spark).collect()) > 0

    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        try:
            # bench.py's isolation rule: queries that persist internal
            # subtrees (sim15, sim8, MLlib pipelines) must not stack 191
            # cached relations across the sweep
            release_shared_pins()
            spark.catalog.clearCache()
            df = fn(spark, sf)
            if name not in osql:
                print(name, "rows-only", df.count(), flush=True)
                continue
            compare(df, run_oracle(osql[name], sf), name)
            print(name, "EXACT MATCH", flush=True)
        except Exception as ex:  # noqa: BLE001 - collect, report all
            fails.append(name)
            print(name, "FAIL", repr(ex)[:300], flush=True)
    print("FAILURES:", fails, flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
