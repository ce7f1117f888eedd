"""Z-order (Morton) clustering for multi-dimension file skipping — the
plain-parquet analog of OPTIMIZE ZORDER BY (Delta) for TWO sort
dimensions, pure Catalyst expressions.

Single-dimension range clustering (``TableManager.write_clustered``)
gives perfect pruning on one key and none on the other; interleaving the
bits of two rank-normalized keys orders rows along a space-filling curve
so every output file covers a LOCALIZED rectangle in (c1, c2) space —
point/range predicates on EITHER column overlap only ~sqrt(n_files)
files instead of all of them.

Shape: one 1-row min/max aggregate per write (driver metadata, same
class as the watermark read), then a zero-shuffle projection computing
the Morton key, then the usual repartitionByRange + sortWithinPartitions
rewrite. The curve quality only needs APPROXIMATE rank normalization —
min/max linear scaling is the standard cheap choice (quantile-based
scaling plugs in for heavily skewed columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension: 16 ⇒ 32-bit Morton keys, plenty of resolution for
#: file-level (not row-level) locality.
ZORDER_BITS = 16


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear-scale a numeric column into [0, 2^bits)."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
        (1 << bits) - 1
    )
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def morton_key(c1: Column, c2: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of two normalized long columns:
    bit i of c1 → bit 2i, bit i of c2 → bit 2i+1."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(c1, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(c2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_frame(
    df: DataFrame, col1: str, col2: str, bits: int = ZORDER_BITS
) -> DataFrame:
    """Attach ``__zkey`` (Morton order of col1 × col2) to ``df``."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(F.col(col1).cast("double")),
        F.max(F.col(col1).cast("double")),
        F.min(F.col(col2).cast("double")),
        F.max(F.col(col2).cast("double")),
    ).collect()[0]
    normed = df.withColumn(
        "__z1", _normalize(F.col(col1), lo1, hi1, bits)
    ).withColumn("__z2", _normalize(F.col(col2), lo2, hi2, bits))
    return normed.withColumn("__zkey", morton_key(F.col("__z1"), F.col("__z2"), bits)).drop(
        "__z1", "__z2"
    )


def write_zordered(
    tm,
    df: DataFrame,
    name: str,
    col1: str,
    col2: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` as ``n_files`` files ordered along the (col1, col2)
    Z-curve; parquet footer min/max on BOTH columns become localized so
    either-column predicates prune files. ``tm`` is a TableManager."""
    z = zorder_frame(df, col1, col2, bits)
    clustered = z.repartitionByRange(n_files, "__zkey").sortWithinPartitions(
        "__zkey"
    ).drop("__zkey")
    tm.overwrite(clustered, name)
