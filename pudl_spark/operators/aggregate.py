"""Aggregation operators with the reference's NA/tie semantics.

Ref: src/pudl/metadata/helpers.py (most_frequent :293,
most_and_more_frequent :303, unique :325), src/pudl/helpers.py
(weighted_average :1771, sum_and_weighted_average_agg :1796,
dedupe :1594), src/pudl/transform/ferc.py (__apply_diffs :14,
__best_snapshot :25), src/pudl/validate/quality.py (weighted_quantile
:67) and its SQL twin dbt/macros/weighted_quantile.sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sum_min_count(col: Column | str, min_count: int = 1) -> Column:
    """pandas ``sum(min_count=1)``: sum of an all-NULL group is NULL,
    not 0 (ref: helpers.py:42 sum_na; mcoe.py:354).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.count(c) >= min_count, F.sum(c))


def weighted_average(df: DataFrame, data_col: str, weight_col: str,
                     by: list[str], out_col: str | None = None) -> DataFrame:
    """sum(x*w)/sum(w where x not null) per group (ref: helpers.py:1771-1793)."""
    out_col = out_col or data_col
    x, w = F.col(data_col), F.col(weight_col)
    return df.groupBy(*by).agg(
        (F.sum(x * w) / F.sum(F.when(x.isNotNull(), w))).alias(out_col)
    )


def weighted_average_expr(data_col: str, weight_col: str) -> Column:
    """The A6 aggregate as a reusable expression."""
    x, w = F.col(data_col), F.col(weight_col)
    return F.sum(x * w) / F.sum(F.when(x.isNotNull(), w))


def sum_and_weighted_average_agg(df: DataFrame, by: list[str],
                                 sum_cols: list[str],
                                 wtavg_dict: dict[str, str]) -> DataFrame:
    """Mixed sum + weighted-average aggregation in ONE groupBy —
    a single shuffle (ref: helpers.py:1796-1832). ``wtavg_dict`` maps
    data_col -> weight_col.
    """
    aggs = [sum_min_count(c).alias(c) for c in sum_cols]
    aggs += [
        weighted_average_expr(c, w).alias(c) for c, w in wtavg_dict.items()
    ]
    return df.groupBy(*by).agg(*aggs)


def most_frequent(df: DataFrame, by: list[str], col: str,
                  tie_break: bool = True) -> DataFrame:
    """Mode per group (ref: metadata/helpers.py:293-300).

    The reference errors on ties (value -> NULL + report); with
    ``tie_break`` we instead break ties deterministically by value —
    callers wanting strict semantics use ``most_and_more_frequent`` with
    a report. Two-level aggregation: count per (group, value), then
    max_by — both map-side combinable.
    """
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*by, col).count()
    )
    w = Window.partitionBy(*by).orderBy(
        F.col("count").desc(), F.col(col).asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    if not tie_break:
        wmax = Window.partitionBy(*by)
        ranked = ranked.withColumn(
            "__nmax", F.sum(
                F.when(F.col("count") == F.max("count").over(wmax), 1)
            ).over(wmax),
        ).withColumn(
            col, F.when(F.col("__nmax") == 1, F.col(col))
        ).drop("__nmax")
    return ranked.filter(F.col("__rn") == 1).drop("__rn", "count")


def most_and_more_frequent(df: DataFrame, by: list[str], col: str,
                           min_frequency: float = 0.7) -> DataFrame:
    """Mode with a minimum relative frequency threshold — below the
    threshold the group's value is NULL
    (ref: metadata/helpers.py:303-322; occurrence_consistency
    transform/eia.py:122-198 uses the same shape).
    """
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*by, col).count()
    )
    w = Window.partitionBy(*by)
    rank_w = Window.partitionBy(*by).orderBy(
        F.col("count").desc(), F.col(col).asc())
    out = (
        counts.withColumn("__total", F.sum("count").over(w))
        .withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            col,
            F.when(F.col("count") / F.col("__total") >= min_frequency,
                   F.col(col)),
        )
        .drop("__rn", "count", "__total")
    )
    return out


def unique_or_null(df: DataFrame, by: list[str], col: str) -> DataFrame:
    """Single distinct non-null value per group, else NULL
    (ref: metadata/helpers.py:325-333 — the reference raises; we NULL
    the cell, matching its harvesting error-capture behavior).
    """
    return df.groupBy(*by).agg(
        F.when(F.count_distinct(F.col(col)) == 1,
               F.first(F.col(col), ignorenulls=True)).alias(col)
    )


def label_unique_source_or_mixed(df: DataFrame, by: list[str],
                                 source_col: str) -> DataFrame:
    """distinct-or-'mixed' label (ref: helpers.py:1461-1474)."""
    return df.groupBy(*by).agg(
        F.when(F.count_distinct(F.col(source_col)) > 1, F.lit("mixed"))
        .otherwise(F.first(source_col, ignorenulls=True))
        .alias(source_col)
    )


def count_records(df: DataFrame, by: list[str],
                  out_col: str = "record_count") -> DataFrame:
    """Group sizes (ref: helpers.py:1477)."""
    return df.groupBy(*by).agg(F.count(F.lit(1)).alias(out_col))


def dedupe_on_category(df: DataFrame, base_cols: list[str],
                       category_col: str, priority: list[str],
                       tie_cols: list[str] | None = None) -> DataFrame:
    """Canonical-row dedup by category priority (ref: helpers.py:1594).

    Keeps, per base key, the row whose category ranks first in
    ``priority``; remaining ties broken by ``tie_cols``.
    """
    rank_map = F.create_map(
        *[F.lit(x) for i, v in enumerate(priority) for x in (v, i)]
    )
    order = [F.coalesce(rank_map[F.col(category_col)], F.lit(len(priority)))]
    order += [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(*base_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )


def best_snapshot(df: DataFrame, pk: list[str], order_col: str,
                  value_cols: list[str]) -> DataFrame:
    """Most-complete row per key: max_by(struct, (non-null count, recency))
    (ref: __best_snapshot src/pudl/transform/ferc.py:25-33).
    """
    nonnull = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in value_cols
    )
    w = Window.partitionBy(*pk).orderBy(
        nonnull.desc(), F.col(order_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )


def apply_diffs(df: DataFrame, pk: list[str], order_col: str,
                value_cols: list[str]) -> DataFrame:
    """Latest non-null per column across refiled reports
    (ref: __apply_diffs src/pudl/transform/ferc.py:14-24;
    filter_for_freshest_data_xbrl :91): one row per key whose each value
    column is the most recent non-null observation.
    """
    w = (
        Window.partitionBy(*pk).orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    keep = [F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols]
    rn_w = Window.partitionBy(*pk).orderBy(F.col(order_col).desc())
    return (
        df.select(*pk, F.col(order_col), *keep)
        .withColumn("__rn", F.row_number().over(rn_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", order_col)
    )


def weighted_quantile(df: DataFrame, data_col: str, weight_col: str,
                      quantile: float, by: list[str] | None = None,
                      out_col: str = "weighted_quantile") -> DataFrame:
    """Interpolated weighted quantile, ties pooled
    (ref: src/pudl/validate/quality.py:67-110; SQL twin
    dbt/macros/weighted_quantile.sql — this is that SQL on Spark).

    cum = (cumsum(w) - w/2) / sum(w) over value order; linear
    interpolation between the bracketing values.
    """
    by = by or []
    x, wt = F.col(data_col).cast("double"), F.col(weight_col).cast("double")
    clean = df.filter(x.isNotNull() & wt.isNotNull() & (wt > 0))
    pooled = clean.groupBy(*by, data_col).agg(
        F.sum(wt).alias("__w")).withColumnRenamed(data_col, "__x")
    ow = Window.partitionBy(*by).orderBy("__x")
    full = Window.partitionBy(*by)
    q = F.lit(quantile)
    c = (
        pooled
        .withColumn("__cum", (F.sum("__w").over(ow) - F.col("__w") / 2)
                    / F.sum("__w").over(full))
        .withColumn("__prev_cum", F.lag("__cum").over(ow))
        .withColumn("__prev_x", F.lag("__x").over(ow))
        .withColumn("__first", F.row_number().over(ow) == 1)
        .withColumn("__last",
                    F.row_number().over(
                        Window.partitionBy(*by).orderBy(F.col("__x").desc())
                    ) == 1)
    )
    interp = F.col("__prev_x") + (F.col("__x") - F.col("__prev_x")) * (
        (q - F.col("__prev_cum")) / (F.col("__cum") - F.col("__prev_cum"))
    )
    val = (
        F.when(F.col("__first") & (q <= F.col("__cum")), F.col("__x"))
        .when(F.col("__last") & (q >= F.col("__cum")), F.col("__x"))
        .when(
            (F.col("__prev_cum") < q) & (q <= F.col("__cum")), interp)
    )
    picked = c.withColumn("__val", val).filter(F.col("__val").isNotNull())
    # Multiple branches can fire only at exact boundaries; take min.
    if by:
        return picked.groupBy(*by).agg(F.min("__val").alias(out_col))
    return picked.agg(F.min("__val").alias(out_col))


def exact_quantiles(df: DataFrame, data_col: str,
                    quantiles: list[float],
                    num_buckets: int = 256,
                    max_slice_rows: int = 100_000) -> DataFrame:
    """EXACT order-statistic quantiles without a total sort — the
    at-scale alternative to ``ORDER BY`` + rank for percentile
    validation screens (ref: src/pudl/validate/quality.py:67 uses
    quantiles as data-quality bounds; this computes the same numbers
    exactly where approxQuantile's error bound is unacceptable).

    The k-th smallest value (k = max(1, ceil(q*n))) is found by
    ITERATIVE histogram narrowing, then a rank-select over a bounded
    slice — never a corpus sort:

      * each round, one scan histograms every still-too-wide
        quantile's current value window into ``num_buckets``
        equi-width buckets (all quantiles batched into a single
        exploded aggregation; rounds after the first carry the
        narrowed windows as LITERAL range predicates, so they read a
        pruned slice, not the corpus) and shrinks the window to the
        rank's bucket widened by one bucket each side — float drift
        in bucket classification is sub-ulp WITHIN a round, so the
        widened window always retains the k-th element;
      * the in-window rank stays exact across rounds because each
        new lower bound's global ``count(v < lo)`` is recounted
        map-side with the same ``<`` the final selection uses (one
        cheap batched agg per round; classification drift never
        accumulates);
      * narrowing stops once every window is estimated under
        ``max_slice_rows`` (or stalls on heavy ties / 8 rounds) —
        log_B(n / max_slice_rows) rounds, e.g. 3 for 10^12 rows;
      * the final rank-select windows only bounded slices: the
        row_number per quantile lands one <= max_slice_rows-ish
        partition per quantile, and the slices' literal range
        predicates push into the parquet reader (row-group min/max
        pruning).

    All collects are bounded (1 + rounds * (num_buckets + 1) rows).
    Output: (quantile DOUBLE, qrank BIGINT, value DOUBLE), one row
    per DISTINCT requested quantile (duplicates collapse — the final
    selection partitions by the quantile value).
    """
    import math

    spark = df.sparkSession
    schema = "quantile double, qrank bigint, value double"
    seen: list[float] = []
    for q in quantiles:
        if float(q) not in seen:
            seen.append(float(q))
    quantiles = seen
    base = (df.select(F.col(data_col).cast("double").alias("__v"))
            .filter(F.col("__v").isNotNull()))
    st = base.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"),
                  F.count("__v").alias("n")).collect()[0]
    n, vmin, vmax = st["n"], st["lo"], st["hi"]
    if n == 0:
        return spark.createDataFrame([], schema)
    ks = [max(1, math.ceil(float(q) * n)) for q in quantiles]
    if vmin == vmax:
        return spark.createDataFrame(
            [(float(q), k, float(vmin)) for q, k in zip(quantiles, ks)],
            schema)

    def window_pred(lo, hi):
        p = F.lit(True) if lo is None else (F.col("__v") >= F.lit(lo))
        if hi is not None:
            p = p & (F.col("__v") < F.lit(hi))
        return p

    # Per-quantile state: value window [lo, hi) guaranteed to hold
    # the k-th element, EXACT global count below lo, and a row
    # estimate used only for loop control.
    state = [{"lo": None, "hi": None, "below": 0, "est": n}
             for _ in quantiles]
    for _ in range(8):
        active = [i for i, s in enumerate(state)
                  if s["est"] > max_slice_rows]
        if not active:
            break
        entries, bounds = [], {}
        for i in active:
            s = state[i]
            wlo = vmin if s["lo"] is None else s["lo"]
            whi = vmax if s["hi"] is None else s["hi"]
            width = (whi - wlo) / num_buckets
            if width <= 0:  # heavy ties — cannot narrow further
                s["est"] = 0
                continue
            bounds[i] = (wlo, width)
            bucket = F.least(F.lit(num_buckets - 1),
                             F.floor((F.col("__v") - F.lit(wlo))
                                     / F.lit(width)))
            entries.append(F.struct(
                F.lit(i).alias("q"),
                F.when(window_pred(s["lo"], s["hi"]), bucket)
                .alias("b")))
        if not entries:
            break
        pre = F.lit(False)
        for i in bounds:
            pre = pre | window_pred(state[i]["lo"], state[i]["hi"])
        hist_rows = (base.filter(pre)
                     .select(F.explode(F.array(*entries)).alias("e"))
                     .filter(F.col("e.b").isNotNull())
                     .groupBy(F.col("e.q").alias("q"),
                              F.col("e.b").alias("b"))
                     .count().collect())
        hist = {}
        for r in hist_rows:
            hist.setdefault(r["q"], {})[r["b"]] = r["count"]
        cand = {}
        for i in bounds:
            s = state[i]
            wlo, width = bounds[i]
            h = hist.get(i, {})
            k_rel = ks[i] - s["below"]
            cum, b = 0, num_buckets - 1
            for j in range(num_buckets):
                cum += h.get(j, 0)
                if cum >= k_rel:
                    b = j
                    break
            lo_c = wlo + (b - 1) * width if b >= 1 else s["lo"]
            hi_c = (wlo + (b + 2) * width
                    if b + 2 <= num_buckets - 1 else s["hi"])
            eff_lo = vmin if lo_c is None else lo_c
            # Stalled (ties concentrated) or float-degenerate (at
            # sub-ulp widths near large magnitudes lo/hi round onto
            # each other) — keep the last VALID window and stop
            # narrowing this quantile.
            if (lo_c, hi_c) == (s["lo"], s["hi"]) or (
                    hi_c is not None and hi_c <= eff_lo):
                s["est"] = 0
                continue
            cand[i] = {"lo": lo_c, "hi": hi_c,
                       "est": sum(h.get(j, 0)
                                  for j in range(max(0, b - 1),
                                                 min(num_buckets, b + 2)))}
        if cand:
            # VERIFY every candidate window with exact counts before
            # trusting it: the k-th element lies inside iff
            # count(v < lo) <= k-1 and count(v < hi) >= k. Bucket-edge
            # float rounding can violate either at ulp-scale widths; a
            # violated window is discarded and the previous (valid,
            # just wider) window stands — so correctness never rests
            # on the drift argument, only on these recounts.
            aggs = []
            for i, c in cand.items():
                if c["lo"] is not None:
                    aggs.append(
                        F.sum(F.when(F.col("__v") < F.lit(c["lo"]), 1)
                              .otherwise(0)).alias(f"lo{i}"))
                if c["hi"] is not None:
                    aggs.append(
                        F.sum(F.when(F.col("__v") < F.lit(c["hi"]), 1)
                              .otherwise(0)).alias(f"hi{i}"))
            row = base.agg(*aggs).collect()[0]
            for i, c in cand.items():
                s = state[i]
                below_c = int(row[f"lo{i}"]) if c["lo"] is not None else 0
                cnt_hi = int(row[f"hi{i}"]) if c["hi"] is not None else n
                if below_c > ks[i] - 1 or cnt_hi < ks[i]:
                    s["est"] = 0
                    continue
                s["lo"], s["hi"], s["below"], s["est"] = (
                    c["lo"], c["hi"], below_c, c["est"])

    spec = [(float(q), k, s["lo"], s["hi"], k - s["below"])
            for q, k, s in zip(quantiles, ks, state)]
    spec_df = spark.createDataFrame(
        spec,
        "quantile double, qrank long, lo double, hi double, off long")
    # LITERAL union-of-windows prefilter before the spec join: the
    # join condition below can never reach the scan (its bounds are
    # join-side columns), but this OR-of-ranges is plain literals —
    # it pushes into the parquet reader and prunes row groups by
    # min/max stats, so the selection reads the final slices only.
    keep = F.lit(False)
    for _, _, lo, hi, _ in spec:
        keep = keep | window_pred(lo, hi)
    cond = ((F.col("lo").isNull() | (F.col("__v") >= F.col("lo")))
            & (F.col("hi").isNull() | (F.col("__v") < F.col("hi"))))
    sel = base.filter(keep).join(F.broadcast(spec_df), on=cond)
    w = Window.partitionBy("quantile").orderBy("__v")
    return (sel.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == F.col("off"))
            .select("quantile", F.col("qrank").cast("bigint").alias("qrank"),
                    F.col("__v").alias("value")))
