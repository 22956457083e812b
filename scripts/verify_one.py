#!/usr/bin/env python
"""Targeted oracle check for iterating on single queries:
    python scripts/verify_one.py name1,name2 [sf_dir]
Same comparator as the full sweep (tests/oracle_utils)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from kinesis_spark.pins import release_shared_pins
from kinesis_spark.queries import get_registry
from kinesis_spark.session import get_spark
from oracle_utils import compare, run_oracle


def main() -> int:
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    reg = get_registry()
    spark = get_spark("verify-one")
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    for name in names:
        q = reg[name]
        try:
            release_shared_pins()
            spark.catalog.clearCache()
            df = q.spark_fn(spark, sf)
            if q.oracle is None:
                print(name, "rows-only", df.count(), flush=True)
                continue
            compare(df, run_oracle(q.oracle, sf), name)
            print(name, "EXACT MATCH", flush=True)
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(name, "FAIL", repr(ex)[:500], flush=True)
    print("FAILURES:", fails, flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
