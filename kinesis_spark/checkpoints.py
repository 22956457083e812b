"""Reliable lineage truncation for the iterative query family.

Every iterative operator in this engine (PageRank g1, BFS g2, connected
components d9, Lloyd's k-means sim11, SemDedup sim12, k-center sim14,
DSIR s16, BPE learning t14, plus the maintenance suite) must pin an
intermediate relation so that N rounds of joins do not build an N-deep
lineage that replays from the source scan every round.

``DataFrame.localCheckpoint`` does that job fast, but its blocks are
stored UNREPLICATED on executor local storage: on a real cluster (spot
instances, 1000 executors, 100x data) losing one executor makes every
later iteration unrecoverable — the query dies instead of recomputing.
``DataFrame.checkpoint`` writes the blocks to the configured reliable
checkpoint directory (HDFS/S3), surviving executor loss, at the cost of
a filesystem round trip per pin.

``pin`` picks automatically: when the session has a reliable checkpoint
directory configured (``spark.sparkContext.setCheckpointDir(...)`` —
the thing a production submit script sets), it uses ``checkpoint``;
otherwise (local dev, the driver's local[32] harness) it falls back to
``localCheckpoint``. Call sites use it through ``DataFrame.transform``
so the chained-method style stays intact::

    state = (df.join(...)            # instead of .localCheckpoint(eager=True)
               .transform(pin))

Nothing here is harness-specific; the switch is the public
``SparkContext.getCheckpointDir`` accessor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _has_reliable_dir(df: DataFrame) -> bool:
    return bool(df.sparkSession.sparkContext.getCheckpointDir())


def pin(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and truncate its lineage.

    Reliable ``checkpoint`` when a checkpoint dir is set, else
    ``localCheckpoint``. Use via ``df.transform(pin)``.
    """
    if _has_reliable_dir(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def pin_lazy(df: DataFrame) -> DataFrame:
    """Lineage-truncate ``df`` without forcing materialization now.

    The lazy variant exists for plans that fork into multiple branches
    below one non-deterministic source (bloom.py's uid assignment): the
    pin guarantees one consistent materialization once ANY branch runs,
    but the caller does not want to pay for it earlier than that.
    """
    if _has_reliable_dir(df):
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
