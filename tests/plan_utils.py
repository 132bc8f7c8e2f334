"""Shared plan-inspection helpers for the structural plan pins."""

from __future__ import annotations


def optimized_plan_classes(df) -> list[str]:
    """Node class names of a DataFrame's optimized logical plan,
    depth-first. The single-text-pass plan pins match on these
    (LogicalRelation = file source, LogicalRDD = checkpointed
    blocks) rather than explain-string substrings, which change
    across Spark versions (ADVICE r12). Shared by
    test_dedup_reference and test_prefix_filter."""
    def walk(node, acc):
        acc.append(node.getClass().getSimpleName())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), acc)
        return acc

    return walk(df._jdf.queryExecution().optimizedPlan(), [])
