"""Z-order (Morton) clustering — multi-dimensional data skipping for a
plain-parquet lakehouse. A linear sort on column A gives perfect file
min/max pruning for A-predicates and none for B; interleaving the bits
of A and B into one Morton key and sorting by THAT gives useful pruning
on BOTH columns (each file covers a small hyper-rectangle of the key
space). This is what table formats run under OPTIMIZE ... ZORDER BY; here
it is explicit and testable: after ``zorder_export``, a predicate on
either column overlaps ~sqrt(n_files) files instead of all of them.

Scale shape: the min/max normalization is one tiny aggregate (2 scalars
per column); the key is a pure column expression (codegen, no UDF); the
layout write is the same range-partitioned shuffle as ``export.py``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution; 2 dims → 32-bit Morton keys


def _scale_to_bits(col: Column, vmin: float, vmax: float, bits: int) -> Column:
    """Affine-map [vmin, vmax] onto the integer grid [0, 2^bits).

    NaN/NULL rows map to grid cell 0 (an arbitrary but stable corner):
    under ANSI mode ``round(NaN).cast('bigint')`` THROWS before the
    clamp could apply, killing the whole export for one bad row — and
    NaN bounds from an aggregate over such a column would poison the
    scale factor the same way."""
    import math

    top = (1 << bits) - 1
    if (
        vmin is None
        or vmax is None
        or math.isnan(float(vmin))
        or math.isnan(float(vmax))
        or vmax == vmin
    ):
        return F.lit(0).cast("bigint")
    scaled = (col.cast("double") - F.lit(float(vmin))) * (
        top / (float(vmax) - float(vmin))
    )
    safe = F.when(F.isnan(scaled) | scaled.isNull(), F.lit(0.0)).otherwise(scaled)
    return F.least(F.greatest(F.round(safe).cast("bigint"), F.lit(0)), F.lit(top))


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton key: bit i of ``a`` → key bit 2i, bit i of ``b`` → 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x + y, terms).cast("bigint")


def zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = ZBITS) -> Column:
    """Morton key column for two numeric columns of ``df`` (bounds taken
    from one min/max aggregate over the frame)."""
    # bounds over the NaN-free values (Spark's max treats NaN as the
    # largest double, so one NaN row would otherwise poison vmax and
    # collapse the whole grid); all-NaN/empty frames yield None bounds
    def _clean(c: str) -> Column:
        cc = F.col(c).cast("double")
        return F.when(F.isnan(cc), None).otherwise(cc)

    row = df.agg(
        F.min(_clean(col_a)), F.max(_clean(col_a)),
        F.min(_clean(col_b)), F.max(_clean(col_b)),
    ).first()
    a = _scale_to_bits(F.col(col_a), row[0], row[1], bits)
    b = _scale_to_bits(F.col(col_b), row[2], row[3], bits)
    return _interleave(a, b, bits)


def zorder_export(
    df: DataFrame, col_a: str, col_b: str, out_dir: str, n_files: int
) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b)."""
    keyed = df.withColumn("__z", zorder_key(df, col_a, col_b))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
