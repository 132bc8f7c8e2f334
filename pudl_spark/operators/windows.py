"""Window/analytic operators (ref: src/pudl/helpers.py rolling utilities,
make_changelog :2627, expand_timeseries :719; run-length + ramp ops in
src/pudl/analysis/operational_characteristics.py; anomaly screens in
src/pudl/analysis/timeseries_cleaning.py:765-1295).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def generate_rolling_avg(df: DataFrame, key_cols: list[str],
                         date_col: str, data_col: str, window: int = 12,
                         out_col: str = "rolling_avg") -> DataFrame:
    """Centered rolling mean over an ordered series per group
    (ref: helpers.py:1375-1423; the reference densifies to a monthly
    backbone first — compose with expand_timeseries for that).
    """
    half = window // 2
    w = (Window.partitionBy(*key_cols).orderBy(date_col)
         .rowsBetween(-half, half))
    return df.withColumn(out_col, F.avg(F.col(data_col)).over(w))


def fillna_w_rolling_avg(df: DataFrame, key_cols: list[str], date_col: str,
                         data_col: str, window: int = 12) -> DataFrame:
    """Impute NULLs from the centered rolling average
    (ref: helpers.py:1426-1458).
    """
    out = generate_rolling_avg(df, key_cols, date_col, data_col, window,
                               out_col="__roll")
    return out.withColumn(
        data_col, F.coalesce(F.col(data_col), F.col("__roll"))
    ).drop("__roll")


def make_changelog(df: DataFrame, key_cols: list[str], date_col: str,
                   value_cols: list[str],
                   until_col: str = "valid_until_date") -> DataFrame:
    """SCD2 changelog: keep the first row of each value-change run;
    valid_until = next change's date (ref: helpers.py:2627-2657).
    """
    w = Window.partitionBy(*key_cols).orderBy(date_col)
    changed = [
        ~(F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))) for c in value_cols
    ]
    any_change = reduce(lambda a, b: a | b, changed)
    first = F.lag(F.col(date_col)).over(w).isNull()
    marked = df.withColumn("__chg", first | any_change)
    kept = marked.filter(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(*key_cols).orderBy(date_col)
    return kept.withColumn(until_col, F.lead(F.col(date_col)).over(w2))


def add_run_ids(df: DataFrame, key_cols: list[str], order_col: str,
                value_col: str, run_col: str = "run_id") -> DataFrame:
    """Gaps-and-islands run ids over consecutive-equal values
    (ref: _add_run_id_expr rle_id in
    analysis/operational_characteristics.py:156; numpy
    encode_run_length analysis/timeseries_cleaning.py:340).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    changed = ~F.col(value_col).eqNullSafe(F.lag(F.col(value_col)).over(w))
    marked = df.withColumn(
        "__new", F.when(F.lag(F.col(order_col)).over(w).isNull(), 1)
        .when(changed, 1).otherwise(0)
    )
    return marked.withColumn(
        run_col, F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


def expand_timeseries(df: DataFrame, key_cols: list[str], date_col: str,
                      freq: str = "month",
                      fill_cols: list[str] | None = None,
                      end_date: str | None = None) -> DataFrame:
    """Densify to a full calendar per key and forward-fill values
    (ref: helpers.py:719-804).

    sequence(min_date, max_date, 1 <freq>) per key -> explode -> left
    join back -> last(value, ignorenulls) over unbounded-preceding.
    The explode happens on the grouped (small) key table, not the fact
    table, so the shuffle is one join on (key, date).
    """
    interval = {
        "year": "interval 1 year", "quarter": "interval 3 months",
        "month": "interval 1 month", "day": "interval 1 day",
        "hour": "interval 1 hour",
    }[freq]
    bounds = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("__min"), F.max(date_col).alias("__max"))
    if end_date:
        bounds = bounds.withColumn("__max", F.lit(end_date).cast("date"))
    backbone = bounds.select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(__min, __max, {interval})")
        ).alias(date_col),
    )
    out = backbone.join(df, on=key_cols + [date_col], how="left")
    if fill_cols is None:
        fill_cols = [c for c in df.columns
                     if c not in key_cols + [date_col]]
    w = (Window.partitionBy(*key_cols).orderBy(date_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    updates = {
        c: F.last(F.col(c), ignorenulls=True).over(w) for c in fill_cols
    }
    return out.withColumns(updates)


def drop_ytd_for_annual_tables(df: DataFrame, entity_cols: list[str],
                               date_col: str,
                               months_required: int = 12) -> DataFrame:
    """Drop partial years by counting distinct months per year-entity
    (ref: src/pudl/output/eia923.py:124).
    """
    year = F.year(F.col(date_col))
    w = Window.partitionBy(*entity_cols, year)
    n = F.size(F.collect_set(F.month(F.col(date_col))).over(w))
    return df.withColumn("__m", n).filter(
        F.col("__m") >= months_required).drop("__m")


def freshest_records(df: DataFrame, pk: list[str],
                     order_col: str) -> DataFrame:
    """row_number over (pk, order desc) == 1 — latest filing wins
    (ref: _filter_for_freshest_data_xbrl src/pudl/transform/ferc714.py:418).
    Ties broken by the full row's natural order via additional pk sort.
    """
    w = Window.partitionBy(*pk).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )


def flag_local_outlier(df: DataFrame, key_cols: list[str], order_col,
                       data_col: str, window: int = 48,
                       multiplier: float = 3.0,
                       flag_col: str = "is_local_outlier",
                       rounded: int | None = None) -> DataFrame:
    """Rolling local-outlier screen: |x - rolling_center| >
    multiplier * rolling spread (ref: flag_local_outlier family,
    src/pudl/analysis/timeseries_cleaning.py:765-1295; the reference
    uses rolling median + IQR — here rolling mean + stddev, the same
    screen shape, exact and distributable without a sort-based
    percentile per frame).
    """
    half = window // 2
    w = (Window.partitionBy(*key_cols).orderBy(order_col)
         .rowsBetween(-half, half))
    center = F.avg(F.col(data_col)).over(w)
    spread = F.stddev_samp(F.col(data_col)).over(w)
    dev = F.abs(F.col(data_col) - center)
    threshold = multiplier * spread
    if rounded is not None:
        # Differential-testing aid: windowed moments are summation-
        # order sensitive in the last ULPs; rounding both comparands
        # makes the flag engine-portable.
        dev, threshold = F.round(dev, rounded), F.round(threshold, rounded)
    return df.withColumn(
        flag_col,
        F.when(F.col(data_col).isNull(), None)
        .otherwise((spread.isNotNull()) & (dev > threshold)),
    )


def ramp_rates(df: DataFrame, key_cols: list[str], order_col: str,
               data_col: str, out_col: str = "ramp") -> DataFrame:
    """Per-unit diff of value over ordered rows
    (ref: analysis/operational_characteristics.py:269-326).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn(
        out_col, F.col(data_col) - F.lag(F.col(data_col)).over(w)
    )


def flag_identical_run(df: DataFrame, key_cols: list[str], order_col: str,
                       data_col: str, min_run: int = 3,
                       flag_col: str = "is_identical_run") -> DataFrame:
    """Flag rows inside a run of >= min_run consecutive identical
    values per key (ref: flag_identical_run,
    src/pudl/analysis/timeseries_cleaning.py:765+). Gaps-and-islands:
    a change marker cumulative-summed into a run id, then the run size
    broadcast back over a run-partitioned window — two window passes
    over the same partitioning, one shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    changed = F.when(
        F.lag(F.col(data_col)).over(w).eqNullSafe(F.col(data_col)),
        F.lit(0)).otherwise(F.lit(1))
    out = df.withColumn("__run", F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    run_w = Window.partitionBy(*key_cols, "__run")
    return (
        out.withColumn(flag_col,
                       (F.count(F.lit(1)).over(run_w) >= min_run)
                       & F.col(data_col).isNotNull())
        .drop("__run")
    )


def flag_global_outlier(df: DataFrame, key_cols: list[str], data_col: str,
                        multiplier: float = 9.0,
                        flag_col: str = "is_global_outlier") -> DataFrame:
    """Flag values beyond multiplier x the series median (ref:
    flag_global_outlier, timeseries_cleaning.py:765+ — value > 9x
    median or < median/9). The per-key median is one exact-median
    aggregation joined back; at scale the join broadcasts (one row
    per key).
    """
    med = df.groupBy(*key_cols).agg(
        F.median(F.col(data_col)).alias("__med"))
    return (
        df.join(F.broadcast(med), on=key_cols, how="left")
        .withColumn(
            flag_col,
            F.when(F.col(data_col).isNull() | F.col("__med").isNull(), None)
            .otherwise((F.col(data_col) > multiplier * F.col("__med"))
                       | (F.col(data_col) < F.col("__med") / multiplier)))
        .drop("__med")
    )


def flag_double_delta(df: DataFrame, key_cols: list[str], order_col: str,
                      data_col: str, threshold: float,
                      flag_col: str = "is_double_delta") -> DataFrame:
    """Flag single-point spikes: the deltas to BOTH neighbors exceed
    the threshold with opposite signs (ref: flag_double_delta,
    timeseries_cleaning.py:765+). Pure lag/lead over one window.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    prev_d = F.col(data_col) - F.lag(F.col(data_col)).over(w)
    next_d = F.lead(F.col(data_col)).over(w) - F.col(data_col)
    return df.withColumn(
        flag_col,
        F.when(prev_d.isNull() | next_d.isNull(), F.lit(False))
        .otherwise((F.abs(prev_d) > threshold) & (F.abs(next_d) > threshold)
                   & (prev_d * next_d < 0)))


def flag_anomalous_region(df: DataFrame, key_cols: list[str], order_cols,
                          flagged_col: str, window: int = 48,
                          threshold: float = 0.15,
                          flag_col: str = "is_anomalous_region") -> DataFrame:
    """Flag unflagged values surrounded by flagged values (ref:
    flag_anomalous_region, src/pudl/analysis/timeseries_cleaning.py:
    1186-1228). An unflagged row is flagged when ALL of:

      * a flagged value exists within the trailing half-window AND
        within the leading half-window (it sits between flags);
      * its run of consecutive unflagged values is <= half-window
        (it is not inside a long healthy stretch);
      * some full-width centered window nearby has > ``threshold``
        fraction flagged (it is inside a genuinely anomalous region).

    Edges use full-window semantics (the reference's
    ``min_periods=window`` NaN -> False). All rolling conditions share
    one (key, order) window partitioning — a single shuffle — plus one
    more exchange on (key, run_id) for the run lengths, exactly the
    shape of `add_run_ids`.
    """
    half = window // 2
    wo = Window.partitionBy(*key_cols).orderBy(*order_cols)
    fint = F.col(flagged_col).cast("int")
    # gaps-and-islands run ids over the flagged/unflagged mask
    changed = F.when(
        F.lag(F.col(flagged_col)).over(wo).eqNullSafe(F.col(flagged_col)),
        F.lit(0)).otherwise(F.lit(1))
    run_id = F.sum(changed).over(
        wo.rowsBetween(Window.unboundedPreceding, 0))
    tmp = df.withColumn("__ar_run", run_id)
    run_len = F.count(F.lit(1)).over(
        Window.partitionBy(*key_cols, F.col("__ar_run")))
    w_after = wo.rowsBetween(-(half - 1), 0)
    w_before = wo.rowsBetween(0, half - 1)
    w_center = wo.rowsBetween(-half, half - 1)
    is_after = ((F.count(F.lit(1)).over(w_after) == half)
                & (F.sum(fint).over(w_after) >= 1))
    is_before = ((F.count(F.lit(1)).over(w_before) == half)
                 & (F.sum(fint).over(w_before) >= 1))
    center_hit = F.when(
        (F.count(F.lit(1)).over(w_center) == window)
        & (F.sum(fint).over(w_center) / window > threshold),
        F.lit(1)).otherwise(F.lit(0))
    tmp = tmp.withColumn("__ar_center", center_hit)
    is_region = F.max(F.col("__ar_center")).over(w_center) == 1
    is_not_run = F.col(flagged_col) | (run_len <= half)
    return tmp.withColumn(
        flag_col,
        (~F.col(flagged_col)) & is_after & is_before
        & is_not_run & is_region,
    ).drop("__ar_run", "__ar_center")


def flag_bad_periods(df: DataFrame, key_cols: list[str], ts_col: str,
                     data_col: str, period: str = "year",
                     min_data: int = 100, min_data_fraction: float = 0.9,
                     flag_col: str = "is_bad_period") -> DataFrame:
    """Flag whole entity-periods missing most of their values (ref:
    flag_bad_years, src/pudl/analysis/timeseries_cleaning.py:
    1231-1291, generalized from year to any date_trunc period).

    coverage = hours from first to last non-null hour (inclusive) in
    the entity-period; the period is bad when coverage < ``min_data``
    or non-null density within that span < ``min_data_fraction``.
    One full-partition window over (key, period) — a single shuffle,
    no join; periods with no data at all are left unflagged like the
    reference (NaN comparisons are False there).
    """
    w = Window.partitionBy(*key_cols, F.date_trunc(period, F.col(ts_col)))
    nn_sec = F.when(F.col(data_col).isNotNull(),
                    F.unix_timestamp(F.col(ts_col)))
    coverage = (F.floor((F.max(nn_sec).over(w) - F.min(nn_sec).over(w))
                        / F.lit(3600)) + 1)
    frac = F.count(F.col(data_col)).over(w) / coverage
    return df.withColumn(
        flag_col,
        F.coalesce((coverage < min_data) | (frac < min_data_fraction),
                   F.lit(False)),
    )


def sessionize(df: DataFrame, key_cols: list[str], ts_col: str,
               id_col: str, gap_seconds: int = 7200,
               out_col: str = "session_id") -> DataFrame:
    """Gaps-and-islands sessionization: consecutive events per key
    closer than ``gap_seconds`` share a session; the session id is the
    minimum ``id_col`` in the session.

    This is the closed form of connected components over the
    consecutive-event path graph (ref: boiler-generator unit
    inference builds the general graph, src/pudl/transform/eia.py:
    701-1065 — but sessionization's adjacency is a path, so the
    component label is computable in exactly ONE shuffle: two window
    passes over the same (key) partitioning, no join, no iteration).
    Use :func:`pudl_spark.operators.graph.connected_components` only
    for genuinely cyclic/branching edge sets.
    """
    order = [ts_col, id_col]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) <= gap_us,
        F.lit(0)).otherwise(F.lit(1))
    run = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ws = Window.partitionBy(*key_cols, "__run")
    return (
        df.withColumn("__run", run)
        .withColumn(out_col, F.min(F.col(id_col)).over(ws))
        .drop("__run")
    )
