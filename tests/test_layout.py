"""Z-order layout: Morton values match a reference implementation and
the range-repartitioned write really produces disjoint, narrow
Z-ranges per partition (the property min/max pruning relies on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pudl_spark.operators.layout import zorder_expr, zorder_layout


def _morton2(x: int, y: int, bits: int = 20) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_expr_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 255, 1023, 54321)
            for y in (0, 1, 7, 999, 65535)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y",
                     zorder_expr(["x", "y"]).alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == _morton2(x, y), (x, y)


def test_zorder_expr_overflow_guard():
    import pytest

    with pytest.raises(ValueError):
        zorder_expr(["a", "b", "c"], bits=21)


def test_zorder_layout_partitions_are_disjoint_z_ranges(spark):
    import itertools

    n = 4096
    rows = [(i % 64, (i * 37) % 64) for i in range(n)]
    df = spark.createDataFrame(rows, ["x", "y"])
    laid = zorder_layout(df, ["x", "y"], bits=6, num_files=8)
    got = (
        laid.withColumn("z", zorder_expr(["x", "y"], bits=6))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"),
             F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert sum(r["cnt"] for r in got) == n
    spans = sorted((r["lo"], r["hi"]) for r in got)
    # ranges must not overlap: file-level min/max pruning depends on it
    for (a, b), (c, d) in itertools.pairwise(spans):
        assert b <= c
    # and clustering must beat random layout: each partition covers a
    # small fraction of the full z-span
    full = max(d for _, d in spans) - min(a for a, _ in spans)
    avg_span = sum(b - a for a, b in spans) / len(spans)
    assert avg_span < full / 4


def test_plan_compaction_packs_small_keeps_large():
    from pudl_spark.operators.layout import plan_compaction

    files = [("big.parquet", 200), ("a.parquet", 40), ("b.parquet", 40),
             ("c.parquet", 30), ("d.parquet", 10), ("e.parquet", 90)]
    plan = plan_compaction(files, target_bytes=100)
    assert ["big.parquet"] in plan
    multi = [g for g in plan if len(g) > 1]
    # every packed group fits the target
    sizes = dict(files)
    for g in multi:
        assert sum(sizes[p] for p in g) <= 100
    # all files appear exactly once
    flat = [p for g in plan for p in g]
    assert sorted(flat) == sorted(sizes)


def test_compact_parquet_roundtrip(spark, tmp_path):
    import glob
    import os

    from pudl_spark.operators.layout import compact_parquet

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    rows = [(i, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "v"])
    # write ten tiny single-file parquets
    for i in range(10):
        part = df.filter((F.col("k") % 10) == i).coalesce(1)
        tmp = d + f"/__w{i}"
        part.write.parquet(tmp)
        src = glob.glob(tmp + "/part-*.parquet")[0]
        os.rename(src, os.path.join(d, f"chunk-{i}.parquet"))
        import shutil
        shutil.rmtree(tmp)
    n_before = len(glob.glob(d + "/*.parquet"))
    rewritten = compact_parquet(spark, d, target_bytes=1024 * 1024)
    n_after = len(glob.glob(d + "/*.parquet"))
    assert rewritten >= 1 and n_after < n_before
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(d).collect())
    assert got == sorted(rows)


def test_compact_parquet_repeated_runs_lose_nothing(spark, tmp_path):
    """ADVICE r3: a second compaction pass must not clobber or delete
    files produced by the first (output names used to restart at
    compacted-00000 every run)."""
    import glob
    import os
    import shutil

    from pudl_spark.operators.layout import compact_parquet

    d = str(tmp_path / "tbl2")
    os.makedirs(d)
    rows = [(i, "x" * 50) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "v"])

    def add_chunks(tag, lo, hi, n):
        for i in range(n):
            part = df.filter((F.col("k") >= lo) & (F.col("k") < hi)
                             & ((F.col("k") % n) == i)).coalesce(1)
            tmp = d + f"/__w{tag}{i}"
            part.write.parquet(tmp)
            src = glob.glob(tmp + "/part-*.parquet")[0]
            os.rename(src, os.path.join(d, f"chunk-{tag}-{i}.parquet"))
            shutil.rmtree(tmp)

    add_chunks("a", 0, 150, 6)
    r1 = compact_parquet(spark, d, target_bytes=1024 * 1024)
    # second batch of small files arrives; pass 2 packs them together
    # with the pass-1 output (all still under target) — pass-1 data
    # must survive the rewrite
    add_chunks("b", 150, 300, 6)
    r2 = compact_parquet(spark, d, target_bytes=1024 * 1024)
    assert r1 >= 1 and r2 >= 1
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(d).collect())
    assert got == sorted(rows)


def test_compact_parquet_splits_oversized_group(spark, tmp_path):
    """VERDICT r4 #7: a group whose total size exceeds 2x target must
    not serialize through one task/file — the rewrite splits it into
    ~ceil(size/target) output files, and no rows are lost."""
    import glob
    import os
    import shutil

    from pudl_spark.operators.layout import compact_parquet

    d = str(tmp_path / "tbl3")
    os.makedirs(d)
    rows = [(i, "y" * 200) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    for i in range(8):
        part = df.filter((F.col("k") % 8) == i).coalesce(1)
        tmp = d + f"/__w{i}"
        part.write.parquet(tmp)
        src = glob.glob(tmp + "/part-*.parquet")[0]
        os.rename(src, os.path.join(d, f"chunk-{i}.parquet"))
        shutil.rmtree(tmp)
    sizes = [os.path.getsize(p) for p in glob.glob(d + "/*.parquet")]
    total = sum(sizes)
    # target small enough that the 8 files form one oversized group
    # when packed by an external plan; force it by calling with a
    # target between max(single) and total/2
    target = max(sizes) + 1
    rewritten = compact_parquet(spark, d, target_bytes=target)
    out_files = glob.glob(d + "/compacted-*.parquet")
    if total > 2 * target and rewritten:
        # at least one group was split into multiple outputs OR the
        # planner kept groups under target (either way: no output
        # file should be grossly over 2x target)
        assert all(os.path.getsize(p) <= 2.5 * target for p in out_files)
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(d).collect())
    assert got == sorted(rows)


def test_compact_parquet_oversized_group_direct(spark, tmp_path):
    """Drive the split path directly: bypass the planner's cap by
    setting target below the per-file size so every pair exceeds 2x
    target... instead call the internal rewrite logic via a plan the
    FFD would never emit — simulated by shrinking target AFTER files
    exist and checking multiple compacted outputs appear for one
    group."""
    import glob
    import os
    import shutil

    from pudl_spark.operators import layout

    d = str(tmp_path / "tbl4")
    os.makedirs(d)
    rows = [(i, "z" * 500) for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    for i in range(6):
        part = df.filter((F.col("k") % 6) == i).coalesce(1)
        tmp = d + f"/__w{i}"
        part.write.parquet(tmp)
        src = glob.glob(tmp + "/part-*.parquet")[0]
        os.rename(src, os.path.join(d, f"chunk-{i}.parquet"))
        shutil.rmtree(tmp)
    files = sorted(glob.glob(d + "/*.parquet"))
    total = sum(os.path.getsize(p) for p in files)
    target = total // 4          # group total = 4x target -> split
    # monkeypatch the planner to emit ONE oversized group
    orig = layout.plan_compaction
    try:
        layout.plan_compaction = lambda fs, tb: [list(files)]
        rewritten = layout.compact_parquet(spark, d, target_bytes=target)
    finally:
        layout.plan_compaction = orig
    assert rewritten == 1
    outs = glob.glob(d + "/compacted-*.parquet")
    assert len(outs) >= 2, "oversized group must split into >1 file"
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(d).collect())
    assert got == sorted(rows)


def test_compact_parquet_split_preserves_clustering(spark, tmp_path):
    """ADVICE r6: a split rewrite of SORTED data must keep min/max
    pruning usable — with cluster_by, output files cover disjoint
    key ranges and rows stay sorted within each file (plain
    repartition would round-robin and destroy both)."""
    import glob
    import os
    import shutil

    from pudl_spark.operators import layout

    d = str(tmp_path / "tbl5")
    os.makedirs(d)
    rows = [(i, "z" * 500) for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    # six key-ranged, internally sorted input files (a zorder-style
    # layout on k)
    for i in range(6):
        part = (df.filter((F.col("k") >= i * 500)
                          & (F.col("k") < (i + 1) * 500))
                .sort("k").coalesce(1))
        tmp = d + f"/__w{i}"
        part.write.parquet(tmp)
        src = glob.glob(tmp + "/part-*.parquet")[0]
        os.rename(src, os.path.join(d, f"chunk-{i}.parquet"))
        shutil.rmtree(tmp)
    files = sorted(glob.glob(d + "/*.parquet"))
    total = sum(os.path.getsize(p) for p in files)
    target = total // 4          # group total = 4x target -> split
    orig = layout.plan_compaction
    try:
        layout.plan_compaction = lambda fs, tb: [list(files)]
        rewritten = layout.compact_parquet(
            spark, d, target_bytes=target, cluster_by=["k"])
    finally:
        layout.plan_compaction = orig
    assert rewritten == 1
    outs = sorted(glob.glob(d + "/compacted-*.parquet"))
    assert len(outs) >= 2, "oversized group must split into >1 file"
    ranges = []
    for p in outs:
        ks = [r["k"] for r in spark.read.parquet(p).collect()]
        if not ks:
            continue
        assert ks == sorted(ks), "rows not sorted within output file"
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, "output file key ranges overlap"
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(d).collect())
    assert got == sorted(rows)
