"""Queries staged for the ROUND-12 driver prefix (r11 ships them
with full differential evidence but no registration: the r11 50-slot
prefix is exactly 7 touched + 43 r6 re-certs, and a new query must
sit in the prefix the round it registers — the standing rule).
`tests/test_r12_queue.py` runs each pair through the same
plain-session-vs-DuckDB comparison the driver uses, so r12's
registration is a move, not a rewrite.

Two stage the REDELIVERY convergence of the r11 idempotent appends
as hash-grade evidence: applying the same batch twice through the
exactly-once guards must leave a store that serves byte-identically
to a single append — the property the streaming loops' crash
recovery rests on (currently pinned by pytest parity tests only).
The third (`doc_lsh_stream_pairs`) certifies the streaming LSH loop
END-TO-END: the pairs sink a three-micro-batch run produces must
hash-match the exact arrival-ordered cross-split Jaccard, batch
attribution included. Two more are staged but labeled for r13 (the
r12 touched/new budget is full): `ivf_stream_matches` (the IVF
stream's end-to-end matches-sink cert) and `ivf_store_reseed`
(rebuild-after-appends == one-shot build over the full corpus).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir,
                                                  f"{name}.parquet"))


def doc_lsh_store_redelivery(spark, sf_dir):
    """Redelivered-batch convergence on the persisted LSH index:
    build on doc_id % 7 > 1, apply the % 7 == 1 slice TWICE through
    `dedup.append_to_lsh_store_idempotent` (a checkpoint redelivery
    replays exactly this), then probe the % 7 == 0 batch. The oracle
    is the ingest query's exact cross-split Jaccard verbatim — the
    hash certifies the doubly-applied store serves identically to a
    singly-appended one (no duplicated index rows inflating
    candidate multiplicity or corrupting set cardinalities).
    """
    import tempfile

    from pudl_spark.functions.dedup import (
        append_to_lsh_store_idempotent, build_lsh_store,
        lsh_store_probe,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 7 > 1)
    ingest = d.filter(F.col("doc_id") % 7 == 1)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory(prefix="pudl_spark_lshrd_") as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "lsh_rd",
                        os.path.join(td, "store"))
        try:
            for _ in range(2):  # second apply = simulated redelivery
                append_to_lsh_store_idempotent(spark, "lsh_rd",
                                               ingest, "doc_id",
                                               "text")
            out = lsh_store_probe(spark, "lsh_rd", batch, "doc_id",
                                  "text", jaccard_threshold=0.8)
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            for t in ("lsh_rd_bands", "lsh_rd_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def doc_lsh_store_redelivery_oracle() -> str:
    from pudl_spark.plans.queries import _lsh_cross_split_sql

    return _lsh_cross_split_sql(7)


def ivf_store_redelivery(spark, sf_dir):
    """Redelivered-batch convergence on the persisted IVF store:
    build on vec_id % 97 != 3, apply the % 97 == 3 slice TWICE
    through `similarity.append_to_ivf_store_idempotent` (the guard
    reads only the batch's own assigned cells), then certify the
    appended slice plus the 1/11 residue — the same oracle as
    `ivf_store_append`, which is exact because the doubly-applied
    store must hold exactly the single-append rows.
    """
    import tempfile

    from pudl_spark.functions.similarity import (
        append_to_ivf_store_idempotent, build_ivf_store,
    )

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 97 != 3)
    batch = e.filter(F.col("vec_id") % 97 == 3)
    with tempfile.TemporaryDirectory(prefix="pudl_spark_ivfrd_") as td:
        build_ivf_store(spark, corpus, "ivf_rd_store",
                        os.path.join(td, "store"))
        try:
            for _ in range(2):
                append_to_ivf_store_idempotent(spark, "ivf_rd_store",
                                               batch)
            out = (spark.table("ivf_rd_store")
                   .filter((F.col("vec_id") % 97 == 3)
                           | (F.col("vec_id") % 11 == 0))
                   .select("cell", "vec_id"))
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            spark.sql("DROP TABLE IF EXISTS ivf_rd_store")
            spark.sql("DROP TABLE IF EXISTS ivf_rd_store_seeds")


def ivf_store_redelivery_oracle() -> str:
    from pudl_spark.plans.queries import ORACLES

    return ORACLES["ivf_store_append"]


def doc_lsh_stream_pairs(spark, sf_dir):
    """End-to-end hash-grade certification of the streaming LSH
    probe-then-ingest loop (`streaming.lsh_ingest_stream`, r11 —
    currently pinned by pytest parity only): documents arrive as
    THREE micro-batches in doc_id % 3 order (one file per batch,
    arrival pinned by explicit mtimes — FileStreamSource processes
    oldest-first under maxFilesPerTrigger=1), batch 0 bootstraps the
    store, and each later batch is mined against everything ingested
    before it. The certified result is the PAIRS SINK itself —
    (new_id, corpus_id, jaccard, batch_id) — whose oracle is the
    exact cross-split shingle-Jaccard under the arrival-order
    predicate ``a.doc_id % 3 > b.doc_id % 3`` with
    ``batch_id = new_id % 3``: slice i arrives in micro-batch i, so
    the union of per-batch probes is exactly the ordered cross-split
    pair set, and the batch_id column certifies WHICH batch mined
    each pair, not just the set.
    """
    import tempfile

    from pudl_spark.streaming.pipeline import lsh_ingest_stream

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory(prefix="pudl_spark_lshsp_") as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        stamped, t0 = set(), 1_000_000_000  # relative order only
        for i in range(3):
            (d.filter(F.col("doc_id") % 3 == i).coalesce(1)
             .write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f not in stamped:  # stamp only this slice's files
                    os.utime(os.path.join(src, f),
                             (t0 + i * 60, t0 + i * 60))
                    stamped.add(f)
        pairs_path = os.path.join(td, "pairs")
        q = lsh_ingest_stream(
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
            "lsh_strmp", os.path.join(td, "store"), pairs_path,
            os.path.join(td, "ckpt"))
        try:
            q.awaitTermination()
            out = (spark.read.schema("new_id long, corpus_id long, "
                                     "jaccard double, batch_id int")
                   .parquet(pairs_path)
                   .select("new_id", "corpus_id", "jaccard",
                           F.col("batch_id").cast("long")
                           .alias("batch_id")))
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            for t in ("lsh_strmp_bands", "lsh_strmp_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def doc_lsh_stream_pairs_oracle() -> str:
    from pudl_spark.plans.queries import _lsh_cross_split_sql

    return _lsh_cross_split_sql(
        3, pair_pred="a.doc_id % 3 > b.doc_id % 3",
        extra_select=",\n  new_id % 3 AS batch_id")


def ivf_stream_matches(spark, sf_dir):
    """STAGED for r13 (the r12 touched/new budget is full at 5):
    end-to-end hash-grade certification of the streaming IVF
    probe-then-ingest loop (`streaming.ivf_ingest_stream`, r11) —
    the embedding-side twin of `doc_lsh_stream_pairs`. Vectors
    arrive as THREE micro-batches in vec_id % 3 order; batch 0
    bootstraps the store (seeds FREEZE at vec_id % 3 = 0 AND
    vec_id % 97 = 1 — the documented IVF caveat), each later batch
    ANN-probes the store grown so far and appends. The certified
    result is the MATCHES SINK — (query_id, neighbor_id, rank,
    score, batch_id) — whose oracle replays the deterministic
    two-level assignment and the probe's exact scoring/tie rules
    (the `ann_ivf_store_probe` CTE shapes) with the seed set
    restricted to the bootstrap slice and each batch's candidates
    restricted to earlier slices (``cl.vec_id % 3 < q.b``), so the
    hash certifies per-batch store contents AND batch attribution.
    """
    import tempfile

    from pudl_spark.streaming.pipeline import ivf_ingest_stream

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with tempfile.TemporaryDirectory(prefix="pudl_spark_ivfsm_") as td:
        src = os.path.join(td, "in")
        os.makedirs(src)
        stamped, t0 = set(), 1_000_000_000  # relative order only
        for i in range(3):
            (e.filter(F.col("vec_id") % 3 == i).coalesce(1)
             .write.mode("append").parquet(src))
            for f in os.listdir(src):
                if f not in stamped:  # stamp only this slice's files
                    os.utime(os.path.join(src, f),
                             (t0 + i * 60, t0 + i * 60))
                    stamped.add(f)
        matches_path = os.path.join(td, "matches")
        q = ivf_ingest_stream(
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
            "ivf_strm", os.path.join(td, "store"), matches_path,
            os.path.join(td, "ckpt"))
        try:
            q.awaitTermination()
            out = (spark.read.schema(
                "query_id long, neighbor_id long, score double, "
                "rank int, batch_id int")
                .parquet(matches_path)
                .select("query_id", "neighbor_id",
                        F.col("rank").cast("int").alias("rank"),
                        F.round("score", 6).alias("score"),
                        F.col("batch_id").cast("long")
                        .alias("batch_id")))
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            spark.sql("DROP TABLE IF EXISTS ivf_strm")
            spark.sql("DROP TABLE IF EXISTS ivf_strm_seeds")


def ivf_stream_matches_oracle() -> str:
    from pudl_spark.plans.queries import _SEMDEDUP_COS, _hex6

    cos = _SEMDEDUP_COS
    h = _hex6("md5(CAST(seed_id AS VARCHAR) || ':cent')")
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, embedding AS seed_vec
  FROM base WHERE vec_id % 3 = 0 AND vec_id % 97 = 1
), k AS (
  SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds
), cents AS (
  SELECT seed_id AS cent_id, seed_vec AS cent_vec FROM seeds, k
  WHERE {h} * sqrt(k.k) < 33554432.0
), seed_cell AS (
  SELECT seed_id, seed_vec, cell FROM (
    SELECT s.seed_id, s.seed_vec, c.cent_id AS cell,
      row_number() OVER (PARTITION BY s.seed_id ORDER BY
        {cos.format(a='s.seed_vec', b='c.cent_vec')} DESC,
        c.cent_id ASC) AS rn
    FROM seeds s CROSS JOIN cents c) WHERE rn = 1
), probes AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cent_id AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {cos.format(a='e.embedding', b='c.cent_vec')} DESC,
        c.cent_id ASC) AS rn
    FROM base e CROSS JOIN cents c) WHERE rn <= 2
), assigned AS (
  SELECT vec_id, seed_id FROM (
    SELECT e.vec_id, sc.seed_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {cos.format(a='e.embedding', b='sc.seed_vec')} DESC,
        sc.seed_id ASC) AS rn
    FROM base e JOIN probes p ON p.vec_id = e.vec_id
    JOIN seed_cell sc ON sc.cell = p.cell) WHERE rn = 1
), cells AS (
  SELECT COALESCE(a.seed_id, -e.vec_id - 1) AS cell,
    e.vec_id, e.embedding
  FROM base e LEFT JOIN assigned a ON a.vec_id = e.vec_id
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, vec_id % 3 AS b
  FROM base WHERE vec_id % 3 > 0
), qprobe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cent_id AS cell,
      row_number() OVER (PARTITION BY q.query_id ORDER BY
        {cos.format(a='q.qv', b='c.cent_vec')} DESC,
        c.cent_id ASC) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= 2
), qseeds AS (
  SELECT query_id, seed_id FROM (
    SELECT q.query_id, sc.seed_id,
      row_number() OVER (PARTITION BY q.query_id ORDER BY
        {cos.format(a='q.qv', b='sc.seed_vec')} DESC,
        sc.seed_id ASC) AS rn
    FROM q JOIN qprobe p ON p.query_id = q.query_id
    JOIN seed_cell sc ON sc.cell = p.cell) WHERE rn <= 3
), cand AS (
  SELECT q.query_id, q.b, cl.vec_id AS neighbor_id,
    {cos.format(a='q.qv', b='cl.embedding')} AS score
  FROM q JOIN qseeds s2 ON s2.query_id = q.query_id
  JOIN cells cl ON cl.cell = s2.seed_id
  WHERE cl.vec_id % 3 < q.b
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
  round(score, 6) AS score, CAST(b AS BIGINT) AS batch_id
FROM (
  SELECT query_id, b, neighbor_id, score,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM cand) WHERE rank <= 3
"""


def ivf_store_reseed(spark, sf_dir):
    """STAGED for r13 (with `ivf_stream_matches`): hash-grade
    certification of `similarity.rebuild_ivf_store`, the reseed
    remedy for IVF append drift (r11). Build on vec_id % 3 == 0,
    append the rest under the FROZEN bootstrap seeds, then reseed —
    the rebuilt store must equal a one-shot build over the full
    corpus, so the oracle is exactly the standard full-base IVF
    assignment (seeds = vec_id % 97 == 1 over ALL of embeddings —
    the same CTEs every registered IVF query replays), certified on
    the 1/7 vec_id residue to bound the collect. This is the
    strongest reseed claim expressible: append drift fully absorbed,
    byte-equal to never having drifted.
    """
    import tempfile

    from pudl_spark.functions.similarity import (
        append_to_ivf_store, build_ivf_store, rebuild_ivf_store,
    )

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with tempfile.TemporaryDirectory(prefix="pudl_spark_ivfrs_") as td:
        p = os.path.join(td, "store")
        try:
            build_ivf_store(spark, e.filter(F.col("vec_id") % 3 == 0),
                            "ivf_rs_store", p)
            append_to_ivf_store(spark, "ivf_rs_store",
                                e.filter(F.col("vec_id") % 3 != 0))
            rebuild_ivf_store(spark, "ivf_rs_store", p)
            out = (spark.table("ivf_rs_store")
                   .filter(F.col("vec_id") % 7 == 0)
                   .select("cell", "vec_id"))
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            spark.sql("DROP TABLE IF EXISTS ivf_rs_store")
            spark.sql("DROP TABLE IF EXISTS ivf_rs_store_seeds")


def ivf_store_reseed_oracle() -> str:
    from pudl_spark.plans.queries import (
        _IVF_ASSIGNED_CTE, _IVF_PROBE_CTES,
    )

    return f"""
WITH {_IVF_PROBE_CTES}, {_IVF_ASSIGNED_CTE}
SELECT COALESCE(a.seed_id, -e.vec_id - 1) AS cell, e.vec_id
FROM base e LEFT JOIN assigned a ON a.vec_id = e.vec_id
WHERE e.vec_id % 7 = 0
"""


def oph_banded_from_sets(sets_df, num_hashes: int = 64,
                         bands: int = 16):
    """STAGED for r12 (VERDICT r9 #6 / r10 #8): LSH band keys
    derived from an already-computed ``(id, __set)`` shingle-hash
    frame — `shingle_hash_sets`' output, or the persisted
    ``{prefix}_sets`` table — instead of re-shingling raw text.
    `build_lsh_store` currently shingles the corpus TWICE (once for
    the bands pass, once for the sets pass); writing sets first and
    deriving bands from them saves one full corpus text pass per
    index build.

    Byte-identical to `dedup.oph_banded` BY CONSTRUCTION: the sets
    frame holds exactly the distinct xxhash64 shingle hashes
    oph_banded's explode produces, and the OPH bin/min/densify/band
    pipeline below applies the same expressions in the same order —
    pinned per-row-equal in tests/test_r12_queue.py at two SFs, so
    the r12 swap (which re-certifies the minhash-family prefix
    slots) ships pre-verified. Kept OUT of dedup.py until then: the
    shared-stage extraction touches `oph_banded`, whose dependent
    certified queries have no r11 prefix slots; the identity test
    doubles as the divergence tripwire while this copy waits.

    Input contract: ``sets_df`` is `shingle_hash_sets` output (or
    the persisted ``{prefix}_sets`` table), which is ALREADY
    `_spread` across cores — this derivation adds no repartition of
    its own.
    """
    rows_per_band = num_hashes // bands
    nb = F.lit(num_hashes)
    exploded = sets_df.select(
        "id", F.explode("__set").alias("__sh"))
    binned = exploded.groupBy(
        "id", F.pmod("__sh", nb).alias("__bin")
    ).agg(F.min("__sh").alias("__mh"))
    sig_map = binned.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("__bin", "__mh"))).alias("__m"))
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig_map = sig_map.withColumn(
        "__v0",
        F.transform(idx, lambda i: F.element_at("__m", i.cast("long"))))

    def _double(prev, s):
        return lambda i: F.coalesce(
            F.element_at(F.col(prev), i + 1),
            F.element_at(F.col(prev),
                         F.pmod(i + F.lit(s), F.lit(num_hashes)) + 1),
        )

    step, r = 1, 0
    while step < num_hashes:
        sig_map = sig_map.withColumn(
            f"__v{r + 1}", F.transform(idx, _double(f"__v{r}", step)))
        step, r = step * 2, r + 1
    sig_agg = sig_map.select(
        "id", F.col(f"__v{r}").alias("__sig")
    ).localCheckpoint(eager=False)
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.slice("__sig", b * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        )
        for b in range(bands)
    ])
    return sig_agg.select(
        "id", F.explode(band_arr).alias("bb")
    ).select("id", "bb.band", "bb.bucket")


def stratified_threshold_sample(df, by, id_col, race_key,
                                thr_fn, thr_type, k: int,
                                rank_col: str = "smp_rank",
                                max_strata: int = 100_000,
                                extra_aggs=(), order_key=None):
    """STAGED for r12 (VERDICT r9 #7 / r10 #9): the ONE
    prefilter/guard scaffold both samplers share —
    `sampling.bottomk_sample` (uniform: race key = full md5, integer
    hex6 threshold) and `sampling.weighted_bottomk_sample` (A-ES:
    race key = -ln(u)/w, double threshold) differ only in the race
    key, the per-stratum aggregates, the threshold rule, and
    (for the uniform sampler, which prefilters on the 6-hex prefix
    but ranks by the FULL digest so prefix collisions stay
    deterministic) an optional distinct ranking key — all of which
    arrive here as parameters. The NULL-stratum eqNullSafe rule, the
    bounded per-stratum driver-state contract (max_strata), the
    shortfall re-admission guard (exactness regardless of
    hash/weight luck), and the (race key, id) deterministic ranking
    then live ONCE. Byte-identity of both samplers replayed through
    this scaffold vs their live implementations is pinned in
    tests/test_r12_queue.py — the r12 swap (which re-certifies the
    doc_bottomk_sample / doc_weighted_sample prefix slots; those two
    are the ONLY registered callers — doc_stratified_sample is the
    map-only rate-based sampler and never touches this scaffold)
    ships pre-verified.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    counts = (df.groupBy(*by)
              .agg(F.count(F.lit(1)).alias("__n"), *extra_aggs)
              .limit(max_strata + 1).collect())
    if len(counts) > max_strata:
        raise ValueError(
            f"stratified sample: more than max_strata={max_strata} "
            f"strata in {by}; per-stratum driver state would be "
            "unbounded. Use a rate-based hash-threshold sample or "
            "aggregate the strata first.")
    thr_rows = [tuple(r[c] for c in by) + (thr_fn(r),) for r in counts]
    thr_df = spark.createDataFrame(
        thr_rows,
        df.select(*by).schema.add("__thr", thr_type)).select(
            *[F.col(c).alias(f"__t_{c}") for c in by], "__thr")

    def stratum_cond(right):
        c = F.lit(True)
        for col in by:
            c = c & F.col(col).eqNullSafe(right(col))
        return c

    pre = (df.join(F.broadcast(thr_df),
                   on=stratum_cond(lambda c: F.col(f"__t_{c}")))
           .filter(race_key < F.col("__thr"))
           .drop("__thr", *[f"__t_{c}" for c in by]))
    need = {tuple(r[c] for c in by): min(k, r["__n"]) for r in counts}
    got = {tuple(r[c] for c in by): r["count"]
           for r in pre.groupBy(*by).count().collect()}
    short = [s for s, m in need.items() if got.get(s, 0) < m]
    if short:
        short_df = spark.createDataFrame(
            [s for s in short], df.select(*by).schema).select(
                *[F.col(c).alias(f"__s_{c}") for c in by])
        readmit = (df.join(F.broadcast(short_df),
                           on=stratum_cond(lambda c: F.col(f"__s_{c}")),
                           how="left_semi")
                   .join(F.broadcast(thr_df),
                         on=stratum_cond(lambda c: F.col(f"__t_{c}")))
                   .filter(race_key >= F.col("__thr"))
                   .drop("__thr", *[f"__t_{c}" for c in by]))
        pre = pre.unionByName(readmit)
    order = order_key if order_key is not None else race_key
    w = Window.partitionBy(*by).orderBy(order.asc(),
                                        F.col(id_col).asc())
    return (pre.withColumn(rank_col,
                           F.row_number().over(w).cast("bigint"))
            .filter(F.col(rank_col) <= k))


def bottomk_sample_staged(df, by, id_col, k=10, salt=":smp",
                          safety=8.0, rank_col="smp_rank",
                          max_strata=100_000):
    """`sampling.bottomk_sample` replayed through the staged unified
    scaffold (identity-pinned)."""
    import math

    from pudl_spark.functions.sampling import _HEX6_MAX, _hash_key

    key = _hash_key(id_col, salt)
    hex6 = F.conv(F.substring(key, 1, 6), 16, 10).cast("long")

    def thr(r):
        n = r["__n"]
        return (_HEX6_MAX if n <= safety * k
                else math.ceil(_HEX6_MAX * safety * k / n))

    # Filter/guard on the 6-hex prefix (that is what the threshold
    # bounds), rank by the FULL digest (prefix-collision
    # determinism) — the scaffold's order_key keeps the two keys
    # separate exactly like the live implementation.
    return stratified_threshold_sample(
        df, by, id_col, hex6, thr, "long", k,
        rank_col=rank_col, max_strata=max_strata, order_key=key)


def weighted_bottomk_sample_staged(df, by, id_col, weight_col, k=10,
                                   salt=":wsmp", safety=8.0,
                                   rank_col="smp_rank",
                                   max_strata=100_000):
    """`sampling.weighted_bottomk_sample` replayed through the
    staged unified scaffold (identity-pinned)."""
    from pudl_spark.functions.sampling import _HEX6_MAX, _hash_key

    df = df.filter(F.col(weight_col) > 0)
    u = ((F.conv(F.substring(_hash_key(id_col, salt), 1, 6), 16, 10)
          .cast("double") + F.lit(0.5)) / F.lit(float(_HEX6_MAX)))
    e = -F.log(u) / F.col(weight_col).cast("double")

    def thr(r):
        return (float("inf") if r["__n"] <= safety * k
                else safety * k / r["__W"])

    return stratified_threshold_sample(
        df, by, id_col, e, thr, "double", k,
        rank_col=rank_col, max_strata=max_strata,
        extra_aggs=(F.sum(F.col(weight_col).cast("double"))
                    .alias("__W"),))
