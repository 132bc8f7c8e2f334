"""Calculation-forest reconciliation (G2).

Ref: XbrlCalculationForestFerc1 (src/pudl/output/ferc1.py:1814-2280)
and reconcile_table_calculations / calculate_values_from_components /
add_corrections (src/pudl/transform/ferc1.py:1006-1162,1237,1634).

The reference models accounting facts as a DAG of calculation edges
(parent fact = sum of weighted child facts), prunes it to a forest on
the driver (the graph is ~10^3 nodes — SURVEY §4 note 3 keeps this
driver-side, exactly like the reference), then checks every parent
against the sum of its children within tolerance and injects
correction records for the residuals.

Spark split: the TREE work (root finding, cycle detection, depth
ordering) happens on collected edge metadata; the FACT work (billions
of (entity, period, fact, value) rows) stays distributed — one join +
groupBy per forest level.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class CalcEdge:
    parent: str
    child: str
    weight: float = 1.0


def forest_levels(edges: list[CalcEdge]) -> list[list[str]]:
    """Topologically layer parents bottom-up: level 0 parents have
    only leaf children; level k parents depend on level <k parents.
    Driver-side on the small edge list (ref: forest pruning
    output/ferc1.py:2118-2280). Raises on cycles.
    """
    parents = {e.parent for e in edges}
    children = {}
    for e in edges:
        children.setdefault(e.parent, []).append(e.child)
    depth: dict[str, int] = {}

    def resolve(p: str, seen: tuple[str, ...]) -> int:
        if p in seen:
            raise ValueError(f"calculation cycle through {p!r}")
        if p in depth:
            return depth[p]
        d = 0
        for ch in children[p]:
            if ch in parents:
                d = max(d, resolve(ch, seen + (p,)) + 1)
        depth[p] = d
        return d

    for p in parents:
        resolve(p, ())
    levels: list[list[str]] = [[] for _ in range(max(depth.values()) + 1)]
    for p, d in depth.items():
        levels[d].append(p)
    return [sorted(lv) for lv in levels]


def reconcile_calculations(facts: DataFrame, edges: list[CalcEdge],
                           key_cols: list[str], fact_col: str,
                           value_col: str,
                           rel_tol: float = 1e-4) -> DataFrame:
    """Check parent = sum(weight * child) per entity/period key.

    Returns one row per (key, parent fact): reported, calculated,
    rel_err, is_consistent, correction (reported - calculated; the
    record the reference injects, ref: add_corrections ferc1.py:1634).
    Each forest level is one broadcast-joined aggregation over the
    distributed fact table; levels run bottom-up so calculated child
    values feed parent sums exactly like Exploder.boom (ferc1.py:1531).
    """
    spark = facts.sparkSession
    edge_df = F.broadcast(spark.createDataFrame(
        [(e.parent, e.child, float(e.weight)) for e in edges],
        "parent string, child string, weight double"))

    # Working copy of fact values, updated level-by-level with the
    # *calculated* parent values so deeper parents sum over them.
    vals = facts.select(*key_cols, F.col(fact_col).alias("fact"),
                        F.col(value_col).alias("value"))
    out = None
    for level in forest_levels(edges):
        lvl_edges = edge_df.filter(F.col("parent").isin(level))
        calc = (
            vals.join(lvl_edges, vals["fact"] == lvl_edges["child"])
            .groupBy(*key_cols, "parent")
            .agg(F.sum(F.col("value") * F.col("weight")).alias("calculated"))
            .withColumnRenamed("parent", "fact")
        )
        reported = vals.join(
            F.broadcast(spark.createDataFrame([(p,) for p in level],
                                              "fact string")),
            on="fact", how="left_semi")
        lvl = (
            reported.withColumnRenamed("value", "reported")
            .join(calc, on=key_cols + ["fact"], how="full_outer")
        )
        lvl = lvl.select(
            *key_cols, "fact", "reported", "calculated",
            F.when(
                F.coalesce(F.abs("reported"), F.lit(0.0)) +
                F.coalesce(F.abs("calculated"), F.lit(0.0)) == 0, F.lit(0.0))
            .otherwise(
                F.abs(F.coalesce("reported", F.lit(0.0))
                      - F.coalesce("calculated", F.lit(0.0)))
                / F.greatest(F.abs(F.coalesce("reported", F.lit(0.0))),
                             F.abs(F.coalesce("calculated", F.lit(0.0)))))
            .alias("rel_err"),
        ).withColumn("is_consistent", F.col("rel_err") <= rel_tol) \
         .withColumn("correction",
                     F.coalesce("reported", F.lit(0.0))
                     - F.coalesce("calculated", F.lit(0.0)))
        out = lvl if out is None else out.unionByName(lvl)
        # calculated values replace reported for the next level up
        vals = vals.join(
            lvl.select(*key_cols, "fact", "calculated"),
            on=key_cols + ["fact"], how="left",
        ).select(
            *key_cols, "fact",
            F.coalesce("calculated", "value").alias("value"))
    return out
