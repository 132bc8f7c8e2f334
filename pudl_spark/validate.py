"""Data-validation checks — the reference's dbt-over-DuckDB test layer
re-expressed as Spark aggregations.

Refs: generic dbt tests in dbt/tests/data_tests/generic_tests/
(expect_quantile_constraints.sql, expect_columns_are_close.sql,
expect_sum_close_to_total_column.sql, expect_one2one_mapping.sql,
foreign_key.sql, check_row_counts_per_partition.sql), the
weighted-quantile macro dbt/macros/weighted_quantile.sql, and the
golden row counts in dbt/seeds/etl_full_row_counts.csv enforced by
tests/validate/row_counts_test.py:20-46.

Every check returns a *violations DataFrame* (empty == pass) so checks
compose into the asset DAG and never collect more than the failure
set; `assert_empty` raises driver-side with a bounded sample, matching
the reference's strict failure modes scale-safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ValidationError(AssertionError):
    """A data-validation check failed."""


def assert_empty(violations: DataFrame, check: str,
                 sample: int = 5) -> None:
    """Raise ValidationError with a bounded sample if any rows exist."""
    rows = violations.limit(sample + 1).collect()
    if rows:
        shown = [r.asDict() for r in rows[:sample]]
        raise ValidationError(f"{check}: violations, e.g. {shown}")


def check_row_counts_per_partition(df: DataFrame, partition_col: str,
                                   expected: dict) -> DataFrame:
    """Golden per-partition row counts (ref: row_counts_per_partition
    macro + etl_full_row_counts.csv seed). ``expected`` maps partition
    value -> exact count. One aggregation; the expected side joins as
    a broadcast literal table.
    """
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(str(k), int(v)) for k, v in expected.items()],
        f"{partition_col} string, expected_count long")
    got = (df.groupBy(F.col(partition_col).cast("string")
                      .alias(partition_col))
           .agg(F.count(F.lit(1)).alias("actual_count")))
    return (
        got.join(F.broadcast(exp), on=partition_col, how="full_outer")
        .filter(
            F.col("actual_count").isNull() | F.col("expected_count").isNull()
            | (F.col("actual_count") != F.col("expected_count")))
    )


def check_quantile_constraints(
        df: DataFrame, col: str,
        constraints: list[tuple[float, float, float]]) -> DataFrame:
    """Quantiles of ``col`` must land inside [lo, hi]
    (ref: expect_quantile_constraints.sql). ``constraints`` is a list
    of (quantile, lo, hi); all quantiles compute in ONE aggregation
    pass. The weighted twin is operators.aggregate.weighted_quantile
    (ref: dbt/macros/weighted_quantile.sql).
    """
    aggs, bounds = [], []
    for i, (q, lo, hi) in enumerate(constraints):
        aggs.append(F.expr(f"percentile({col}, {q})").alias(f"q{i}"))
        bounds.append((i, q, lo, hi))
    row = df.agg(*aggs)
    checks = []
    for i, q, lo, hi in bounds:
        checks.append(
            row.select(
                F.lit(col).alias("column"), F.lit(q).alias("quantile"),
                F.col(f"q{i}").alias("value"),
                F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
            .filter((F.col("value") < lo) | (F.col("value") > hi)))
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def check_columns_are_close(df: DataFrame, col_a: str, col_b: str,
                            rel_tol: float = 1e-6,
                            key_cols: list[str] | None = None) -> DataFrame:
    """Row-wise |a-b| <= rel_tol * max(|a|,|b|)
    (ref: expect_columns_are_close.sql). NULL on both sides passes.
    """
    a, b = F.col(col_a), F.col(col_b)
    bad = ~(
        (a.isNull() & b.isNull())
        | (F.abs(a - b) <= rel_tol * F.greatest(F.abs(a), F.abs(b)))
    )
    keep = (key_cols or []) + [col_a, col_b]
    return df.filter(bad).select(*keep)


def check_sum_close_to_total(df: DataFrame, group_cols: list[str],
                             part_col: str, total_col: str,
                             rel_tol: float = 1e-6) -> DataFrame:
    """Sum of parts per group must match the (constant-in-group) total
    (ref: expect_sum_close_to_total_column.sql; also the allocation
    conservation check, analysis/allocate_gen_fuel.py:63-68).
    """
    agg = df.groupBy(*group_cols).agg(
        F.sum(part_col).alias("sum_parts"),
        F.first(total_col).alias("total"))
    bad = ~(F.abs(F.col("sum_parts") - F.col("total"))
            <= rel_tol * F.greatest(F.abs(F.col("sum_parts")),
                                    F.abs(F.col("total"))))
    return agg.filter(bad)


def check_one2one_mapping(df: DataFrame, col_a: str,
                          col_b: str) -> DataFrame:
    """Each value of a maps to exactly one b and vice versa
    (ref: expect_one2one_mapping.sql). Two tiny distinct-aggs.
    """
    a_multi = (df.groupBy(col_a)
               .agg(F.count_distinct(col_b).alias("n"))
               .filter(F.col("n") > 1)
               .select(F.col(col_a).cast("string").alias("value"),
                       F.lit(col_a).alias("side"), "n"))
    b_multi = (df.groupBy(col_b)
               .agg(F.count_distinct(col_a).alias("n"))
               .filter(F.col("n") > 1)
               .select(F.col(col_b).cast("string").alias("value"),
                       F.lit(col_b).alias("side"), "n"))
    return a_multi.unionByName(b_multi)


def check_foreign_key_df(child: DataFrame, child_cols: list[str],
                         parent: DataFrame,
                         parent_cols: list[str]) -> DataFrame:
    """FK orphans as a violations frame (ref: foreign_key.sql; the
    count form lives in schema.enforce.check_foreign_key).
    """
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
    ).dropDuplicates()
    pred = None
    for c in child_cols:
        cond = F.col(c).isNotNull()
        pred = cond if pred is None else (pred & cond)
    return (child.filter(pred)
            .join(F.broadcast(parent_keys), on=child_cols, how="left_anti")
            .select(*child_cols).dropDuplicates())


def observed_counts(df: DataFrame, name: str,
                    exprs: dict[str, F.Column]):
    """Single-pass ETL counters via DataFrame.observe: attach named
    aggregate expressions to the frame and read them AFTER an action
    without a second scan — the production pattern for data-quality
    tallies (null counts, out-of-range counts) that must not double
    the job's I/O. Returns (observed_df, observation); call
    ``observation.get`` once an action has run.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    named = [c.alias(k) for k, c in exprs.items()]
    return df.observe(obs, *named), obs
