"""triangle_stats: degree-oriented triangle counting on hand-built
graphs with known closed-form answers."""

from __future__ import annotations

from pudl_spark.operators.graph import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: (r["degree"], r["n_triangles"],
                        r["clustering_coeff"])
            for r in triangle_stats(df).collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _stats(spark, k4)
    assert got == {n: (3, 3, 1.0) for n in range(4)}


def test_triangle_with_pendant(spark):
    # 0-1-2 triangle, 3 hangs off node 2.
    got = _stats(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(2.0 * 1 / (3 * 2), 6))
    assert got[3] == (1, 0, 0.0)


def test_duplicate_and_reversed_edges_and_self_loops(spark):
    # Dedupe + canonicalization: duplicates, reversals and self-loops
    # must not change the counts.
    got = _stats(spark, [(0, 1), (1, 0), (1, 2), (2, 1),
                         (0, 2), (0, 0), (2, 2), (0, 1)])
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0), 2: (2, 1, 1.0)}


def test_square_has_no_triangles(spark):
    got = _stats(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert all(v == (2, 0, 0.0) for v in got.values())


def test_two_triangles_sharing_an_edge(spark):
    # 0-1-2 and 1-2-3: shared edge (1,2) — nodes 1,2 sit in two
    # triangles each with degree 3.
    got = _stats(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert got[0] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)
    c = round(2.0 * 2 / (3 * 2), 6)
    assert got[1] == (3, 2, c) and got[2] == (3, 2, c)
