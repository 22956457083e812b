"""Totally-ordered dataset export — the scale-correct "ORDER BY the whole
table" : a range-partitioned shuffle (sampled split points → evenly sized
output files) with a local sort per partition. File part indices follow
the range order, so reading files in name order IS the global order —
no single-task global sort anywhere.

This is what Spark's own ``orderBy`` does before a write; the operator
makes the contract explicit (n_files, the ordering columns, and the
file-boundary invariant that tests assert: max(file_i) <= min(file_i+1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sorted_export(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_files: int | None = None,
) -> None:
    """Write ``df`` to ``out_dir`` as parquet files that concatenate to a
    globally ``cols``-sorted dataset (ties ordered arbitrarily but
    deterministically within a file)."""
    if n_files is not None:
        shaped = df.repartitionByRange(n_files, *cols)
    else:
        shaped = df.repartitionByRange(*cols)
    shaped.sortWithinPartitions(*cols).write.mode("overwrite").parquet(out_dir)
