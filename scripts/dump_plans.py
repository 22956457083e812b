#!/usr/bin/env python
"""Dump .explain("formatted") for the given registered queries into
plans/r{ROUND}/<name>_<suffix>.txt (the judge checks plan claims against
these committed files). Usage:
    python scripts/dump_plans.py before q1 q2 ...
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kinesis_spark.queries import get_registry  # noqa: E402
from kinesis_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(os.path.join(REPO, "ROUND")) as f:
        rnd = int(f.read().strip())
    out_dir = os.path.join(REPO, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()
    import contextlib
    import io

    for name in names:
        df = reg[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('Scan parquet')} parquet-scan strings)",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
