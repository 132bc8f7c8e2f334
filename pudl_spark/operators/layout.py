"""Physical-layout operators: Z-order (Morton) multi-dimensional
clustering for data-skipping at scale.

A 100 TB table is only as fast as the scans it can SKIP. Parquet
min/max footer stats prune files, but only along the sort order; a
table range-sorted by one key cannot prune on a second. Interleaving
the bits of several keys (the public Z-order/Morton curve — the same
recipe as Delta Lake's OPTIMIZE ZORDER BY and Hudi/Iceberg clustering)
gives every participating column locality in the SAME file ordering,
so min/max pruning works on all of them at once.

Everything here is exact integer Column algebra (shift/and/add) inside
whole-stage codegen — no UDFs, no shuffle until the explicit
range-repartition that the write path needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_expr(cols: list[str | Column], bits: int = 20) -> Column:
    """Morton interleave of the low `bits` bits of each column.

    With n columns the result occupies n*bits bits (must stay < 63
    for ANSI-safe long arithmetic). Column i contributes its bit b to
    output position b*n + i — the textbook Morton layout, generalized
    to n dimensions. Keys wider than `bits` bits keep their low bits
    only; callers clustering billion-key columns should raise `bits`
    (n*bits <= 62) or pre-scale keys into range.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
          for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_layout(df: DataFrame, cols: list[str], bits: int = 20,
                  num_files: int | None = None) -> DataFrame:
    """Cluster `df` on the Z-curve over `cols`: one range-repartition
    on the Morton value (Spark samples the distribution, so skewed
    curves still split evenly), then an intra-partition sort so each
    output file covers one tight Z-range. Every column in `cols` then
    has narrow min/max per file => multi-column data skipping.

    The single Exchange here replaces the sort a naive
    `orderBy(cols)` write would do anyway — Z-ordering costs nothing
    extra at write time and buys pruning on ALL the listed columns.
    """
    zv = zorder_expr(cols, bits=bits).alias("__z")
    out = df.withColumn("__z", zv)
    parts = [num_files] if num_files else []
    return (
        out.repartitionByRange(*parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
