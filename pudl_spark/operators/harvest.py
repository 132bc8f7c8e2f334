"""Entity harvesting — PUDL's most distinctive engine.

Ref: Resource.aggregate_df / harvest_dfs
(src/pudl/metadata/classes.py:2129-2289), groupby_aggregate
(src/pudl/metadata/helpers.py:503-591), and the consistency voting in
occurrence_consistency (src/pudl/transform/eia.py:122-198).

Semantics: N source tables each carry (a subset of) an entity's
attributes keyed by the entity PK. Harvesting unions the column-subsets
of all sources and aggregates per PK with per-column strategies; a cell
whose group fails its strategy (tie, below-threshold consistency,
non-unique) becomes NULL, and every (column, key) group's vote tally is
available as a companion *report* — the reference's "errors captured
per group" re-expressed as data, since Spark aggregates can't raise per
group (SURVEY §4 note 2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from pudl_spark.operators.sets import union_by_name


@dataclass(frozen=True)
class HarvestResult:
    entity: DataFrame   # one row per PK, harvested attribute columns
    report: DataFrame   # (column, *pk, total, top_count, consistency)


def harvest(sources: dict[str, DataFrame], pk: list[str],
            columns: dict[str, str],
            min_frequency: float = 0.7) -> HarvestResult:
    """Harvest entity attributes from many sources.

    ``columns`` maps attribute -> strategy in
    {"most_frequent", "most_and_more_frequent", "unique", "sum", "max",
    "min"}. Sources missing an attribute contribute NULLs (ignored by
    the voting).

    Plan shape: one unionByName (narrow) -> per-attribute two-level
    aggregate (count per (pk, value), then window top-1) -> PK-joined
    assembly. Every aggregate is map-side combinable; the joins are
    co-partitioned on the PK so AQE plans them as one exchange.
    """
    tagged = []
    for name, df in sources.items():
        cols = [c for c in pk + list(columns) if c in df.columns]
        missing_pk = set(pk) - set(df.columns)
        if missing_pk:
            raise KeyError(f"source {name}: missing pk {sorted(missing_pk)}")
        tagged.append(
            df.select(*cols).withColumn("__source", F.lit(name)))
    # Pin the pooled union (r15, guide §2.1/§6.1): it feeds the
    # entity-PK distinct, one aggregation per harvested column and
    # the report branches — un-pinned, Catalyst replays every
    # source's scan+projection per consumer (3 sources x 3 consumers
    # = 9 scans in harvest_user_profile's plan). The pool is already
    # projected to pk + harvested columns, so the materialized
    # blocks are as narrow as the pruned scans they replace.
    pool = union_by_name(tagged).localCheckpoint(eager=False)

    entity = pool.select(*pk).distinct()
    reports = []
    for col, strategy in columns.items():
        if col in pk:
            continue
        obs = pool.filter(F.col(col).isNotNull()).select(*pk, col)
        if strategy in ("sum", "max", "min"):
            fn = {"sum": F.sum, "max": F.max, "min": F.min}[strategy]
            agg = obs.groupBy(*pk).agg(fn(F.col(col)).alias(col))
            entity = entity.join(agg, on=pk, how="left")
            continue
        counts = obs.groupBy(*pk, col).count()
        w_rank = Window.partitionBy(*pk).orderBy(
            F.col("count").desc(), F.col(col).asc())
        w_all = Window.partitionBy(*pk)
        voted = (
            counts
            .withColumn("__total", F.sum("count").over(w_all))
            .withColumn("__rn", F.row_number().over(w_rank))
            .filter(F.col("__rn") == 1)
            .withColumn("__consistency",
                        F.col("count") / F.col("__total"))
        )
        if strategy == "unique":
            keep = F.col("__total") == F.col("count")
        elif strategy == "most_and_more_frequent":
            keep = F.col("__consistency") >= min_frequency
        elif strategy == "most_frequent":
            keep = F.lit(True)
        else:
            raise ValueError(f"unknown harvest strategy {strategy!r}")
        reports.append(
            voted.select(
                F.lit(col).alias("column"), *pk,
                F.col("__total").alias("total"),
                F.col("count").alias("top_count"),
                F.col("__consistency").alias("consistency"),
                keep.alias("kept"),
            )
        )
        resolved = voted.withColumn(
            col, F.when(keep, F.col(col))
        ).select(*pk, col)
        entity = entity.join(resolved, on=pk, how="left")

    report = union_by_name(reports) if reports else None
    return HarvestResult(entity=entity, report=report)
