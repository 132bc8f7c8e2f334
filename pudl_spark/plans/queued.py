"""Work staged for FUTURE driver-prefix rounds (pre-verified but
not yet registered: a new query must sit in the 50-slot prefix the
round it registers, and a swap touching certified queries waits for
the round those rotate through the prefix — the standing rules).

The four r12-staged queries (`ivf_stream_matches`,
`ivf_store_reseed`, `datapackage_descriptor`,
`events_null_value_screen`) REGISTERED in r13 and now live in
`plans/queries.py`. What remains staged here:

- `build_lsh_store_singlepass` — the build half of the
  `oph_banded_from_sets` swap (the one-shot-miner half landed r12).
  It touches all five LSH-store rows, so it swaps in r15 when the
  r11-certified trio rotates through the prefix (see the budget
  sketch in __spark_entry__.py). Tripwires:
  tests/test_r14_queue.py byte-identity at store level plus the
  two-SF derivation pin.
"""

from __future__ import annotations

import os


def _t(spark, sf_dir, name):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir,
                                                  f"{name}.parquet"))


def build_lsh_store_singlepass(spark, df, id_col, text_col,
                               table_prefix, path,
                               num_hashes: int = 64, bands: int = 16,
                               shingle_k: int = 3,
                               num_buckets: int = 8) -> None:
    """STAGED for r15 (the build half of the oph_banded_from_sets
    swap — the one-shot-miner half landed r12): `build_lsh_store`
    with the corpus shingled ONCE. The live build pays two full
    text passes (oph_banded's explode for the bands table, then
    shingle_hash_sets for the sets table); here the SETS table
    writes first and the bands derive from the WRITTEN table via
    `dedup.oph_banded_from_sets` — the second corpus text pass
    becomes a scan of stored hash arrays. Write order flips (sets
    before bands) with unchanged crash semantics: both tables drop
    first, the build is re-runnable from scratch, and probes/appends
    assert against the bands table's params — written last, so a
    half-built store fails loudly rather than serving.

    Byte-identity of BOTH output tables vs the live build is pinned
    in tests/test_r14_queue.py (the store-level tripwire; the
    derivation-level tripwire pins two SFs). Measured same-session
    at sf0.1 (r12): live build floor 2.36 s, single-pass **1.60 s**
    — 32% off the index build, and the saved work is the corpus
    text pass, so the fraction grows with document length at scale.
    Swap deferred until the five LSH-store rows rotate through the
    driver prefix (r15 for the r11 trio — see the budget sketch in
    __spark_entry__.py).
    """
    from pudl_spark.functions.dedup import (
        _invalidate_store_bytes, oph_banded_from_sets,
        shingle_hash_sets,
    )
    from pudl_spark.sources.files import (
        set_table_build_params, write_bucketed_table,
    )

    for t in (f"{table_prefix}_bands", f"{table_prefix}_sets"):
        _invalidate_store_bytes(spark, t)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed_table(
        shingle_hash_sets(df, id_col, text_col, shingle_k),
        f"{table_prefix}_sets", ["id"], num_buckets,
        sort_cols=["id"], path=os.path.join(path, "sets"))
    write_bucketed_table(
        oph_banded_from_sets(spark.table(f"{table_prefix}_sets"),
                             num_hashes, bands),
        f"{table_prefix}_bands", ["band", "bucket"], num_buckets,
        sort_cols=["band", "bucket", "id"],
        path=os.path.join(path, "bands"))
    set_table_build_params(
        spark, f"{table_prefix}_bands",
        {"num_hashes": num_hashes, "bands": bands,
         "shingle_k": shingle_k, "num_buckets": num_buckets})


def table_quality_screens(spark, sf_dir):
    """STAGED for r14 (VERDICT r12 #4): composite driver row
    exercising the eleven r13-ported dbt validation shapes
    (validate.py — refs check_column_correlation.sql,
    expect_column_fraction_with_condition.sql,
    expect_includes_all_value_combinations_from.sql,
    expect_columns_not_all_null.sql, expect_missingness_between.sql,
    expect_date_frequency_ratio.sql,
    expect_column_weighted_quantile_values_to_be_between.sql, and
    the dbt/macros/ shapes one_value_per_key.sql,
    expect_column_change_within_ratio.sql, expect_columns_ratio.sql,
    expect_summed_columns_not_exceed_threshold.sql)
    through the REAL check
    functions, one row per check: (check_name, n_violations,
    metric). Pass AND fail paths both appear (correlation and
    missingness are configured to fail on the test data with wide
    margins; fraction, combinations-coverage-modulo-the-planted-key
    and the maturity-screened date ratio pass). Float metrics route
    through exact decimal sums (or exact integer ratios) before any
    double arithmetic, so the final doubles are bit-identical
    cross-engine per the hash-parity discipline; F.corr itself is
    used only for the 0/1 violation count, 0.497 away from its
    threshold.
    """
    from pyspark.sql import functions as F

    from pudl_spark.validate import (
        check_column_correlation,
        check_column_fraction_with_condition,
        check_columns_not_all_null,
        check_date_frequency_ratio,
        check_includes_all_value_combinations_from,
        check_missingness_between,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dec = "decimal(12,2)"
    rows = []

    # 1. correlation — quantity vs extendedprice is ~0.003 on the
    #    synthetic data, so min_corr=0.5 FAILS with a huge margin;
    #    the metric replays Pearson r from exact decimal sums.
    n1 = check_column_correlation(
        li, "l_quantity", "l_extendedprice", 0.5).count()
    x = F.col("l_quantity").cast(dec)
    y = F.col("l_extendedprice").cast(dec)
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy")).select(
        F.round((F.col("n") * F.col("sxy")
                 - F.col("sx") * F.col("sy"))
                / (F.sqrt(F.col("n") * F.col("sxx")
                          - F.col("sx") * F.col("sx"))
                   * F.sqrt(F.col("n") * F.col("syy")
                            - F.col("sy") * F.col("sy"))), 6)
        .alias("r")).collect()[0]
    rows.append(("column_correlation", int(n1), float(s["r"])))

    # 2. weighted fraction — share of quantity on returned lines is
    #    ~0.334; bounds [0.2, 0.5] PASS. Decimal-cast quantity makes
    #    both engines' sums exact before the double division.
    li2 = li.withColumn("l_qty_dec", x)
    n2 = check_column_fraction_with_condition(
        li2, "l_qty_dec", F.col("l_returnflag") == "R",
        0.2, 0.5).count()
    m2 = li2.agg(F.round(
        F.sum(F.when(F.col("l_returnflag") == "R",
                     F.col("l_qty_dec")).otherwise(F.lit(0)))
        * F.lit(1.0) / F.sum("l_qty_dec"), 4).alias("f")
    ).collect()[0]["f"]
    rows.append(("column_fraction_with_condition", int(n2),
                 float(m2)))

    # 3. not-all-null — a planted all-NULL column is the one
    #    violation; every real orders column passes.
    n3 = check_columns_not_all_null(
        orders.withColumn("ghost",
                          F.lit(None).cast("string")),
        table_name="orders").count()
    rows.append(("columns_not_all_null", int(n3), None))

    # 4. combination coverage — region keys plus a planted key 99
    #    vs the keys nation actually references: exactly the planted
    #    key is missing.
    want = (region.select(F.col("r_regionkey").alias("k"))
            .unionByName(spark.range(1).select(
                F.lit(99).cast("long").alias("k"))))
    n4 = check_includes_all_value_combinations_from(
        nation.select(F.col("n_regionkey").alias("k")), want,
        ["k"]).count()
    rows.append(("includes_all_value_combinations", int(n4), None))

    # 5. missingness — value nulled at event_id % 13 == 0 (~7.7%)
    #    vs an upper bound of 5%: FAILS; the metric is an exact
    #    integer ratio, bit-identical cross-engine.
    ev = events.withColumn(
        "value", F.when(F.col("event_id") % 13 != 0,
                        F.col("value")))
    n5 = check_missingness_between(ev, "value", 0.0, 0.05).count()
    m5 = ev.agg(F.round(
        (F.count(F.lit(1)) - F.count("value")).cast("double")
        / F.count(F.lit(1)), 6).alias("p")).collect()[0]["p"]
    rows.append(("missingness_between", int(n5), float(m5)))

    # 6. date-frequency ratio — monthly vs annual order dates at
    #    12:1, with the final partial year marked provisional so the
    #    maturity screen excludes it: PASSES (the screen is what
    #    makes it pass — without it the partial year breaks 12:1).
    mat = F.when(F.year("o_orderdate") == 2001,
                 F.lit("incremental_ytd")).otherwise(F.lit("final"))
    monthly = orders.select(
        F.date_trunc("month", "o_orderdate").alias("report_date"),
        mat.alias("data_maturity"))
    annual = orders.select(
        F.date_trunc("year", "o_orderdate").alias("report_date"),
        mat.alias("data_maturity"))
    n6 = check_date_frequency_ratio(monthly, annual, 12).count()
    rows.append(("date_frequency_ratio", int(n6), None))

    # 7. weighted-quantile bounds — the quantity-weighted median of
    #    extendedprice (~53k at every test SF) against [20k, 80k]:
    #    PASSES with a huge margin. Count-only (metric NULL): the
    #    check's quantile routes through the operator's double-path
    #    cumulative windows, deterministic per engine but not
    #    bit-pinned cross-engine, so only the wide-margin 0/1
    #    verdict crosses the hash (the value itself is hash-pinned
    #    by the registered weighted_median_quantity row, which keeps
    #    DECIMAL discipline end-to-end).
    from pudl_spark.validate import check_weighted_quantile_constraints

    n7 = check_weighted_quantile_constraints(
        li, "l_extendedprice", "l_quantity",
        [(0.5, 20000.0, 80000.0)]).count()
    rows.append(("weighted_quantile_constraints", int(n7), None))

    # 8-11. the four standalone dbt/macros/ shapes (r13 second
    #    pass), each count-only and data-derived: customers holding
    #    orders at more than one priority (one_value_per_key — a
    #    deliberately violation-rich configuration), per-priority
    #    yearly order counts moving >50% year-over-year
    #    (change_within_ratio — the partial final year trips it),
    #    discount/tax row ratios past 2.0 with the zero/NULL
    #    denominator pass rule, and discount+tax budgets over a 0.12
    #    cap. All integer counts; ratios compare exact-int-derived
    #    doubles, so the 0/N verdicts are engine-stable.
    from pudl_spark.validate import (
        check_column_change_within_ratio, check_columns_ratio,
        check_one_value_per_key,
        check_summed_columns_not_exceed_threshold,
    )

    n8 = check_one_value_per_key(
        orders, "o_custkey", "o_orderpriority").count()
    rows.append(("one_value_per_key", int(n8), None))

    yearly = orders.groupBy(
        "o_orderpriority",
        F.year("o_orderdate").alias("y")).agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    n9 = check_column_change_within_ratio(
        yearly, "n", "o_orderpriority", "y",
        max_pct_change=0.5).count()
    rows.append(("column_change_within_ratio", int(n9), None))

    n10 = check_columns_ratio(li, "l_discount", "l_tax",
                              max_ratio=2.0).count()
    rows.append(("columns_ratio", int(n10), None))

    n11 = check_summed_columns_not_exceed_threshold(
        li.withColumn("cap", F.lit(0.12)), "l_discount", "l_tax",
        "cap").count()
    rows.append(("summed_columns_not_exceed_threshold",
                 int(n11), None))

    return spark.createDataFrame(
        rows, "check_name string, n_violations long, metric double")


def table_quality_screens_oracle() -> str:
    return """
WITH cs AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      AS syy,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      AS sxy
  FROM lineitem
), corr_row AS (
  SELECT
    CAST(CASE WHEN corr(l_quantity, l_extendedprice) < 0.5
         THEN 1 ELSE 0 END AS BIGINT) AS n_violations
  FROM lineitem
), frac AS (
  SELECT round(
    sum(CASE WHEN l_returnflag = 'R'
        THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END)
    * 1.0 / sum(CAST(l_quantity AS DECIMAL(12,2))), 4) AS f
  FROM lineitem
), miss AS (
  SELECT
    CAST(count(*) - count(CASE WHEN event_id % 13 <> 0
                          THEN value END) AS DOUBLE)
      / count(*) AS p
  FROM events
), combos AS (
  SELECT CAST(count(*) AS BIGINT) AS n_missing FROM (
    SELECT k FROM (
      SELECT r_regionkey AS k FROM region
      UNION SELECT CAST(99 AS BIGINT)) w
    EXCEPT SELECT DISTINCT n_regionkey FROM nation)
), wq AS (
  SELECT
    CAST(CASE WHEN wm < 20000.0 OR wm > 80000.0 THEN 1 ELSE 0 END
         AS BIGINT) AS n_violations
  FROM (
    SELECT MIN(val) AS wm FROM (
      SELECT CASE
        WHEN rn = 1 AND 0.5 <= c THEN x
        WHEN rn = n AND 0.5 >= c THEN x
        WHEN prev_c < 0.5 AND 0.5 <= c
          THEN prev_x + (x - prev_x) * ((0.5 - prev_c) / (c - prev_c))
      END AS val FROM (
        SELECT x, rn, n,
          (CAST(cw AS DOUBLE) - CAST(w AS DOUBLE) / 2)
            / CAST(tw AS DOUBLE) AS c,
          LAG((CAST(cw AS DOUBLE) - CAST(w AS DOUBLE) / 2)
              / CAST(tw AS DOUBLE)) OVER (ORDER BY x) AS prev_c,
          LAG(x) OVER (ORDER BY x) AS prev_x
        FROM (
          SELECT x, w, SUM(w) OVER (ORDER BY x) AS cw,
            SUM(w) OVER () AS tw,
            ROW_NUMBER() OVER (ORDER BY x) AS rn,
            COUNT(*) OVER () AS n
          FROM (
            SELECT l_extendedprice AS x,
              SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_quantity IS NOT NULL AND l_quantity > 0
            GROUP BY 1)))
    ) WHERE val IS NOT NULL)
), freq AS (
  SELECT
    CAST(CASE WHEN sum(mc) <> sum(yc) * 12 THEN 1 ELSE 0 END
         AS BIGINT) AS n_violations
  FROM (
    SELECT m.year, m.mc, y.yc FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS year,
        count(DISTINCT date_trunc('month', o_orderdate)) AS mc
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <> 2001
      GROUP BY 1) m
    JOIN (
      SELECT EXTRACT(year FROM o_orderdate) AS year,
        count(DISTINCT date_trunc('year', o_orderdate)) AS yc
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <> 2001
      GROUP BY 1) y ON m.year = y.year)
)
SELECT 'column_correlation' AS check_name,
  (SELECT n_violations FROM corr_row) AS n_violations,
  (SELECT round((n*sxy - sx*sy)
                / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
   FROM cs) AS metric
UNION ALL
SELECT 'column_fraction_with_condition',
  (SELECT CASE WHEN f < 0.2 OR f > 0.5 THEN 1 ELSE 0 END
   FROM frac),
  (SELECT CAST(f AS DOUBLE) FROM frac)
UNION ALL
SELECT 'columns_not_all_null',
  (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM orders),
  NULL
UNION ALL
SELECT 'includes_all_value_combinations',
  (SELECT n_missing FROM combos), NULL
UNION ALL
SELECT 'missingness_between',
  (SELECT CASE WHEN p < 0.0 OR p > 0.05 THEN 1 ELSE 0 END
   FROM miss),
  (SELECT round(p, 6) FROM miss)
UNION ALL
SELECT 'date_frequency_ratio',
  (SELECT n_violations FROM freq), NULL
UNION ALL
SELECT 'weighted_quantile_constraints',
  (SELECT n_violations FROM wq), NULL
UNION ALL
SELECT 'one_value_per_key',
  (SELECT CAST(count(*) AS BIGINT) FROM (
    SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
    GROUP BY o_custkey
    HAVING count(DISTINCT o_orderpriority) > 1)), NULL
UNION ALL
SELECT 'column_change_within_ratio',
  (SELECT CAST(count(*) AS BIGINT) FROM (
    SELECT * FROM (
      SELECT CASE WHEN prev <> 0 THEN abs((n - prev) / prev) END
        AS pc, prev
      FROM (
        SELECT CAST(n AS DOUBLE) AS n,
          LAG(CAST(n AS DOUBLE)) OVER (
            PARTITION BY o_orderpriority ORDER BY y) AS prev
        FROM (
          SELECT o_orderpriority,
            EXTRACT(year FROM o_orderdate) AS y, count(*) AS n
          FROM orders GROUP BY 1, 2)))
    WHERE prev IS NOT NULL AND pc > 0.5)), NULL
UNION ALL
SELECT 'columns_ratio',
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
   WHERE l_tax IS NOT NULL AND l_tax <> 0
     AND l_discount / l_tax > 2.0), NULL
UNION ALL
SELECT 'summed_columns_not_exceed_threshold',
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
   WHERE l_discount + l_tax IS NOT NULL
     AND l_discount + l_tax > 0.12), NULL
"""
