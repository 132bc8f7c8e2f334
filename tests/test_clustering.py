"""Blocked clustering (G3 shape): engineered tight clusters must come
out as single-linkage components; unrelated vectors stay singletons."""

from __future__ import annotations

import numpy as np

from pudl_spark.functions.clustering import cluster_embeddings_blocked


def make_vectors():
    rng = np.random.RandomState(7)
    base_a = rng.randn(64)
    base_b = rng.randn(64)
    rows = []
    # cluster around A: ids 0-2, cluster around B: ids 10-11, noise 20+
    for i in range(3):
        rows.append((i, (base_a + 0.01 * rng.randn(64)).tolist()))
    for i in range(2):
        rows.append((10 + i, (base_b + 0.01 * rng.randn(64)).tolist()))
    for i in range(3):
        rows.append((20 + i, rng.randn(64).tolist()))
    return rows


def test_blocked_clusters_found(spark):
    df = spark.createDataFrame(make_vectors(),
                               "vec_id long, embedding array<double>")
    out = cluster_embeddings_blocked(df, threshold=0.95)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert len(got) == 8                       # every vector labeled
    assert got[0] == got[1] == got[2] == 0     # A-cluster, min id 0
    assert got[10] == got[11] == 10            # B-cluster, min id 10
    noise = {got[20], got[21], got[22]}
    assert noise == {20, 21, 22}               # noise stays singleton
    assert got[0] != got[10]


def test_ivf_topk_exact_at_full_probe_and_recall(spark):
    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.functions.similarity import brute_force_topk, ivf_topk

    emb = read_parquet_table(
        spark, "/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    # nprobe == nlist scans every cell -> must equal brute force
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, queries, k=5, nlist=4, nprobe=4).collect()
    }
    assert full == exact
    # partial probe: recall@5 over the 3 queries stays useful
    part = ivf_topk(emb, queries, k=5, nlist=8, nprobe=3).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in part}
    want = {(q, n) for (q, _), n in exact.items()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall


# ------------------------- cross-year pipeline (reference semantics)

def _cross_year_df(rows):
    import pandas as pd

    return pd.DataFrame(rows, columns=["rid", "report_year", "x", "y"])


def _run_pipeline(pdf, **kw):
    from pudl_spark.functions.clustering import cluster_records_cross_year

    labs = cluster_records_cross_year(
        pdf, feature_cols=["x", "y"], metric="euclidean", **kw)
    return dict(zip(pdf["rid"], labs))


def test_cross_year_basic_entities_span_years():
    # Two entities, three years each, far apart: DBSCAN links each
    # entity's yearly records (distance ~0.1 < eps), year penalty
    # keeps the two entities separate.
    pdf = _cross_year_df([
        (0, 2018, 0.0, 0.0), (1, 2019, 0.1, 0.0), (2, 2020, 0.0, 0.1),
        (10, 2018, 5.0, 5.0), (11, 2019, 5.1, 5.0), (12, 2020, 5.0, 5.1),
    ])
    got = _run_pipeline(pdf, eps=0.5)
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11] == got[12]
    assert got[0] != got[10]


def test_cross_year_same_year_records_never_dbscan_link():
    # Two same-year records at identical coordinates: the year
    # penalty forces them apart; each pairs with its own next-year
    # twin instead.
    pdf = _cross_year_df([
        (0, 2018, 0.0, 0.0), (1, 2018, 0.0, 0.0),
        (2, 2019, 0.05, 0.0), (3, 2019, 5.0, 5.0),
    ])
    got = _run_pipeline(pdf, eps=0.5, orphan_threshold=0.5)
    # 0 and 1 both sit within eps of record 2 -> DBSCAN would merge
    # all three into one cluster with duplicated year 2018; the split
    # step must break the tie so no final cluster holds two 2018 rows.
    by_label = {}
    for rid, lab in got.items():
        by_label.setdefault(lab, []).append(rid)
    for members in by_label.values():
        years = [int(pdf.loc[pdf.rid == r, "report_year"].iloc[0])
                 for r in members]
        assert len(set(years)) == len(years), (members, years)


def test_cross_year_orphan_attaches_to_near_cluster():
    # Record 5 is isolated (no single neighbor within eps) so DBSCAN
    # calls it noise, but it sits close to the (0,1) cluster on
    # average -> the orphan pass attaches it. Record 9 is far from
    # everything and must stay its own cluster.
    pdf = _cross_year_df([
        (0, 2018, 0.0, 0.0), (1, 2019, 0.1, 0.0),
        (5, 2020, 0.7, 0.0),       # 0.6-0.7 away: outside eps=0.5
        (9, 2020, 50.0, 50.0),
    ])
    got = _run_pipeline(pdf, eps=0.5, orphan_threshold=1.0)
    assert got[0] == got[1] == got[5]
    assert got[9] != got[0]


def test_cross_year_spark_island_stable_ids(spark):
    from pudl_spark.functions.clustering import cluster_embeddings_cross_year

    rng = np.random.RandomState(3)
    base = rng.randn(64)
    rows = []
    for i, year in enumerate([2018, 2019, 2020]):
        rows.append((i, year, (base + 0.01 * rng.randn(64)).tolist()))
    rows.append((50, 2018, (-base + 0.01 * rng.randn(64)).tolist()))
    df = spark.createDataFrame(
        rows, "vec_id long, report_year int, embedding array<double>")
    got = {r["vec_id"]: r["cluster_id"]
           for r in cluster_embeddings_cross_year(
               df, eps=0.5, metric="cosine").collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[50] == 50


def test_embedding_quantization_roundtrip_and_guard(spark):
    from pudl_spark.functions.similarity import embedding_quantize_stats

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.5]),          # exact endpoints + midpoint
         (2, [3.0, 3.0, 3.0]),          # zero-range vector (guard path)
         (3, [-2.0, 2.0])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_quantize_stats(df).collect()}
    # endpoints land exactly on code 0/255; max error bounded by scale/2
    assert (out[1]["q_min"], out[1]["q_max"]) == (0, 255)
    # reported err is rounded to 6dp, so allow half an ulp of that
    assert out[1]["max_abs_err"] <= (1.0 / 255.0) / 2 + 5e-7
    # constant vector: all codes 0, perfect reconstruction
    assert (out[2]["q_min"], out[2]["q_max"]) == (0, 0)
    assert out[2]["max_abs_err"] == 0.0
    assert out[3]["n_dims"] == 2
    assert out[3]["max_abs_err"] == 0.0  # endpoints quantize exactly
