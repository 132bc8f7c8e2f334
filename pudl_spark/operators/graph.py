"""Graph operators — connected components without GraphFrames.

Ref: boiler-generator unit inference builds a bipartite multigraph per
plant and labels units by connected component
(src/pudl/transform/eia.py:701-1065, networkx at :945-985). The
components there are tiny (per-plant) but numerous, so the Spark-first
form is iterative min-label propagation over the edges DataFrame:
each round every node adopts the smallest label among itself and its
neighbors; converges in O(component diameter) rounds (diameters in the
reference data are <= ~5). Large-scale safe: every round is one
self-join + groupBy-min on the same key — AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """Label propagation + pointer jumping: returns (node, component)
    where component is the minimum node id reachable from node. Node
    ids must be orderable (int/string); labels are checkpointed every
    round (constant-depth lineage at any graph size).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # Self-loops make the per-round neighbor-min aggregation subsume
    # the node's own label, collapsing the old join-then-least step
    # into the single groupBy — one join fewer per round. They also
    # keep isolated-from-now-on nodes in the frame.
    sym = sym.union(
        sym.select(F.col("a"), F.col("a").alias("b")).distinct())
    # The adjacency list joins against labels EVERY round; materialize
    # it once so the union+distinct shuffle (and the upstream edge
    # computation — often a window over the raw table) doesn't replay
    # per iteration.
    sym = sym.localCheckpoint(eager=True)
    # Round 1 needs no label table at all: propagating the identity
    # labeling through the neighbor-min is just min(neighbor id), and
    # the self-loops guarantee every node appears. This removes the
    # init-distinct shuffle AND the first join — two fewer jobs,
    # which on small/mid graphs is a large share of the wall time.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("component"))
        .localCheckpoint(eager=True)
    )
    numeric = labels.schema["component"].dataType.typeName() in (
        "long", "integer", "short", "byte")
    # Fixpoint detection sums labels as DECIMAL(38,0): a plain long
    # sum can wrap modulo 2^64 (non-ANSI sessions wrap silently), so
    # two DIFFERENT labelings whose sums differ by a multiple of 2^64
    # could alias as "converged". Decimal sums cannot wrap — overflow
    # surfaces as null/error, never a false equality — and the headroom
    # (10^38 vs n * 2^63) covers any graph below ~10^19 nodes.
    _dsum = F.sum(F.col("component").cast("decimal(38,0)"))
    prev_sum = None
    if numeric:
        prev_sum = labels.agg(_dsum).collect()[0][0]
    for _ in range(1, max_iter):
        # min label over neighbors-plus-self (self-loop included)
        new = (
            sym.join(labels, on=sym["b"] == labels["node"])
            .select(F.col("a").alias("node"),
                    F.col("component").alias("nbr_component"))
            .groupBy("node")
            .agg(F.min("nbr_component").alias("component"))
        )
        # Pointer jumping (path halving): component <- label of the
        # component node itself. Turns per-round progress from one hop
        # into doubling, so convergence is O(log diameter) — the
        # difference between 40 and 6 shuffle rounds on a
        # 10^12-edge graph with long chains. The self-join consumes
        # `new` twice; recomputing its (join+agg) subtree inside ONE
        # job is cheaper than materializing it first (an extra
        # checkpoint write + job per round — measured 2x wall on
        # small/mid graphs, and at scale an exchange reuse serves the
        # second read anyway).
        jumped = new.alias("l").join(
            new.select(F.col("node").alias("component"),
                       F.col("component").alias("grand")).alias("g"),
            on="component", how="left")
        new = jumped.select(
            "node",
            F.least(F.col("component"),
                    F.coalesce(F.col("grand"), F.col("component")))
            .alias("component")).localCheckpoint(eager=True)
        if numeric:
            # Labels only ever decrease, so sum(component) is a strict
            # monotone; fixpoint <=> the sum stops moving. One cheap
            # aggregation on the materialized frame instead of a
            # label-to-label join per round. prev_sum is seeded from
            # round 1 before the loop, so None==None here means an
            # EMPTY edge set — converged by definition, not a skip.
            new_sum = new.agg(_dsum).collect()[0][0]
            done = new_sum == prev_sum
            prev_sum = new_sum
        else:
            done = (
                new.alias("n").join(labels.alias("o"), on="node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1).count() == 0
            )
        labels = new
        if done:
            break
    return labels
