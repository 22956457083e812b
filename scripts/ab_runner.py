#!/usr/bin/env python
"""One block of the r7-vs-HEAD A/B adjudication (VERDICT r8 task 1).

Round 8 closed with an 11-entry bench regression tripwire explained by
a two-sentinel host-noise argument the verdict called insufficient. The
definitive control is a SAME-SESSION A/B: check the r7 tree out beside
HEAD and alternate timed blocks of the flagged queries — both trees see
the same host, so the measured ratio isolates the CODE, and the fixed
sentinel (bench.py's host gauge) anchors each block's absolute speed.

Usage:  python scripts/ab_runner.py <tree_path> <name1,name2,...>
Prints one JSON line {"tree":..., "sentinel": s, "queries": {name: s}}.
The orchestrator (scripts/ab_adjudicate.sh-style loop, see
ABTEST_r09.json provenance note) runs r7/HEAD blocks alternately and
keeps the per-tree best, exactly bench.py's best-of-N discipline.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, tree)

    from kinesis_spark.io import TABLES, load_table
    from kinesis_spark.queries import get_registry
    from kinesis_spark.session import get_spark

    try:  # pins.py exists from r8 on; the r7 tree predates it
        from kinesis_spark.pins import release_shared_pins
    except ImportError:  # pragma: no cover - r7 tree only
        def release_shared_pins(**_k):
            return 0

    spark = get_spark("ab-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def sentinel_once() -> float:
        t0 = time.monotonic()
        noop(
            spark.range(0, 30_000_000, 1, 32)
            .selectExpr("xxhash64(id) % 100000 AS h", "id % 9973 AS k")
            .groupBy("k")
            .agg({"h": "sum"})
        )
        return time.monotonic() - t0

    sent = round(min(sentinel_once() for _ in range(3)), 3)
    reg = get_registry()
    out: dict[str, float] = {}
    for name in names:
        if name not in reg:
            continue
        best = float("inf")
        for _ in range(2):
            release_shared_pins()
            spark.catalog.clearCache()
            t0 = time.monotonic()
            noop(reg[name].spark_fn(spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"tree": tree, "sentinel": sent, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
