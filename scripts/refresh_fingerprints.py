#!/usr/bin/env python
"""Re-record kinesis_spark/queries/fingerprints.json after editing a
registered query (tests/test_driver_rotation.py fails until you run
this). A changed fingerprint gets round = the newest CORRECTNESS round
on disk, which re-queues the query at the front of the driver window
until a later round re-verifies it; unchanged entries keep their state.

--migrate: for fingerprint-ALGORITHM changes only — recompute every fp
but keep each entry's recorded round (an algorithm switch is not a
semantic change; bumping rounds would requeue the whole catalog).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_spark.queries import load_fingerprint_snapshot, refresh_fingerprints


def main() -> None:
    old = load_fingerprint_snapshot()
    new = refresh_fingerprints(write=True, migrate="--migrate" in sys.argv)
    changed = [
        n for n in new
        if n not in old or old[n]["fp"] != new[n]["fp"]
    ]
    requeued = [n for n in changed if n in old]
    print(f"{len(new)} entries; {len(changed)} recorded fresh")
    if requeued:
        print("re-queued for driver verification:", ", ".join(sorted(requeued)))


if __name__ == "__main__":
    main()
