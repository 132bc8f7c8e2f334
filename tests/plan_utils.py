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


def file_scan_schemas(df) -> list[tuple[str, list[str]]]:
    """(table file name, pruned column list) for every parquet
    FileSourceScan in the PRE-AQE physical plan (sparkPlan — the
    adaptive wrapper hides children until execution). The
    column-pruning pins assert on these instead of grepping
    ReadSchema out of explain text."""
    def walk(node, acc):
        acc.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), acc)
        return acc

    out = []
    for n in walk(df._jdf.queryExecution().sparkPlan(), []):
        if "FileSourceScan" in n.getClass().getSimpleName():
            cols = [f.name() for f in n.requiredSchema().fields()]
            loc = n.relation().location().rootPaths().head().toString()
            out.append((loc.rstrip("/").rsplit("/", 1)[-1], cols))
    return out


def rdd_scan_schemas(df) -> list[tuple[str, ...]]:
    """Sorted column tuples of every distinct RDD scan (checkpointed
    relation) in the PRE-AQE physical plan. A query that pins shared
    inputs via localCheckpoint hides its file scans behind these
    (the checkpoint carries ONLY the pruned projection, so its
    schema is what bounds bytes at scale); the pruning pins assert
    on the checkpointed schemas instead."""
    def walk(node, acc):
        acc.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), acc)
        return acc

    out = set()
    for n in walk(df._jdf.queryExecution().sparkPlan(), []):
        if "RDDScan" in n.getClass().getSimpleName():
            out.add(tuple(sorted(
                f.name() for f in n.schema().fields())))
    return sorted(out)
