"""Proportional allocation — split group totals across members.

Ref: src/pudl/analysis/allocate_gen_fuel.py (prep :1131, allocate
:1268,:1393; semantics docstring :1-133): plant-level fuel/generation
totals are split to generators in proportion to a granular reported
value; where the granular value is missing the split falls back to a
capacity-weighted ratio; ALL/SOME/NONE coverage cases. Conservation
holds: sum(allocated) == total per group.

Pure window math — sums over Window.partitionBy(group) + a when
cascade; no shuffle beyond the group partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def allocate_proportionally(df: DataFrame, group_cols: list[str],
                            total_col: str, basis_col: str,
                            fallback_col: str | None = None,
                            out_col: str = "allocated") -> DataFrame:
    """Allocate ``total_col`` (constant within a group) across the
    group's rows.

    Coverage cases (ref: allocate_gen_fuel.py docstring :1-133):
      ALL rows report a basis  -> alloc = (basis / sum_basis) * total
      SOME rows report         -> reporters keep their reported basis
          (scaled down by total/sum_basis if reports exceed the total);
          non-reporters share the remainder weighted by ``fallback_col``
          (or equally when None)
      NONE reports             -> alloc = (fallback / sum_fb) * total
    """
    w = Window.partitionBy(*group_cols)
    basis = F.col(basis_col).cast("double")
    total = F.col(total_col).cast("double")
    fallback = (F.col(fallback_col).cast("double") if fallback_col
                else F.lit(1.0))

    sum_basis = F.sum(basis).over(w)
    n_missing = F.sum(F.when(basis.isNull(), 1).otherwise(0)).over(w)
    sum_fb_missing = F.sum(F.when(basis.isNull(), fallback)).over(w)
    sum_fb_all = F.sum(fallback).over(w)

    all_report = n_missing == 0
    none_report = sum_basis.isNull()
    degenerate = sum_basis == 0  # reported but all zero

    proportional = (basis / sum_basis) * total
    reporter_some = F.when(sum_basis > total,
                           (basis / sum_basis) * total).otherwise(basis)
    remainder = F.greatest(F.lit(0.0), total - sum_basis)
    non_reporter_some = (fallback / sum_fb_missing) * remainder
    fallback_split_all = (fallback / sum_fb_all) * total

    alloc = (
        F.when(none_report | degenerate, fallback_split_all)
        .when(all_report, proportional)
        .when(basis.isNotNull(), reporter_some)
        .otherwise(non_reporter_some)
    )
    return df.withColumn(out_col, alloc)
