"""Deterministic distributed sampling.

``bottomk_sample`` is the engine-portable equivalent of per-stratum
reservoir sampling (ref: the reference samples strata for validation
spot-checks, src/pudl/validate/quality.py — here made deterministic):
the k rows with the smallest ``md5(id || salt)`` per stratum form an
exact uniform without-replacement k-sample, stable across runs,
machines and engines (no rand()/TABLESAMPLE), mergeable across
partitions (the bottom-k of a union is the bottom-k of per-part
bottom-ks — the same property KMV sketches use).

Both samplers are thin parameterizations of ONE scaffold,
`stratified_threshold_sample` (the r9-scheduled unification, landed
r12): the NULL-stratum eqNullSafe rule, the bounded per-stratum
driver-state contract, the shortfall re-admission guard and the
deterministic (race key, id) ranking live once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_HEX6_MAX = 16 ** 6


def _hash_key(id_col: str, salt: str) -> F.Column:
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))


def stratified_threshold_sample(df: DataFrame, by: list[str],
                                id_col: str, race_key, thr_fn,
                                thr_type: str, k: int,
                                rank_col: str = "smp_rank",
                                max_strata: int = 100_000,
                                extra_aggs=(),
                                order_key=None) -> DataFrame:
    """The ONE prefilter/guard scaffold both samplers share —
    `bottomk_sample` (uniform: race key = full md5, integer hex6
    threshold) and `weighted_bottomk_sample` (A-ES: race key =
    -ln(u)/w, double threshold) differ only in the race key, the
    per-stratum aggregates, the threshold rule, and (for the
    uniform sampler, which prefilters on the 6-hex prefix but ranks
    by the FULL digest so prefix collisions stay deterministic) an
    optional distinct ranking key — all of which arrive here as
    parameters.

    Shape (the naive alternative — ``row_number() OVER (PARTITION
    BY stratum ORDER BY key)`` — shuffles EVERY row to rank k of
    them; at 100 TB that is a corpus-wide exchange for a k-row
    answer):

      1. per-stratum counts + ``extra_aggs`` (map-side partial agg;
         limit()-bounded collect — one row per stratum);
      2. keep only rows whose ``race_key`` falls below the
         per-stratum threshold ``thr_fn(stratum_row)`` (map-side
         codegen predicate against a broadcast threshold table —
         survivors are ~``safety * k`` rows per stratum);
      3. GUARD: recount survivors; any stratum with fewer than
         min(k, n) survivors re-admits its cut rows. The guard
         makes the result EXACT regardless of hash/weight luck: if
         a true bottom-k row were cut, all survivors would rank
         strictly below it, so the stratum would still hold >= k
         survivors — a shortfall is therefore the only way
         correctness could be at risk, and it triggers the
         fallback;
      4. rank the surviving sliver by (``order_key`` or
         ``race_key``, id) and keep rn <= k.

    Only the sliver ever shuffles. NULL is a legal stratum value
    (the definitional window groups NULLs together), so every
    stratum join is eqNullSafe — a plain equi-join would silently
    drop NULL-keyed rows from both the prefilter and the shortfall
    re-admission.

    DRIVER-CARDINALITY CONTRACT (ADVICE r7): steps 1 and 3 each
    collect ONE row per stratum (and the threshold table broadcasts
    one row per stratum), so the driver materialization is bounded
    by the stratum count, not the data — fine for the
    validation-stratum shapes this exists for (languages, years,
    sources), an OOM with a high-cardinality ``by`` key. The
    ``max_strata`` guard fails loudly instead (the guard count
    itself is limit()-bounded before the collect): above it, use
    the map-only rate-based `doc_stratified_sample` shape
    (Bernoulli by hash threshold — no per-stratum driver state) or
    aggregate the strata first.
    """
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
        # Exactness fallback: re-admit the shortfall strata's cut
        # rows in full.
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


def bottomk_sample(df: DataFrame, by: list[str], id_col: str,
                   k: int = 10, salt: str = ":smp",
                   safety: float = 8.0,
                   rank_col: str = "smp_rank",
                   max_strata: int = 100_000) -> DataFrame:
    """Exact bottom-k-by-hash sample per stratum, with a threshold
    prefilter so the window sort never sees the full data.

    Because the hash is uniform, the k-th smallest key per stratum
    concentrates near ``k/n`` of the key space, so rows whose
    6-hex-digit key prefix falls below ``safety * k / n`` of the
    prefix space survive the prefilter (~``safety * k`` per
    stratum) and the scaffold's shortfall guard makes the result
    exact regardless of hash luck — see
    `stratified_threshold_sample` for the shared shape and the
    bounded-driver-state contract.

    The prefilter/guard operate on the 6-hex PREFIX (that is what
    the threshold bounds) but the ranking orders by the FULL
    128-bit digest with an id tie-break, so the sample stays
    deterministic even under prefix collisions.
    """
    key = _hash_key(id_col, salt)
    hex6 = F.conv(F.substring(key, 1, 6), 16, 10).cast("long")

    def thr(r):
        n = r["__n"]
        return (_HEX6_MAX if n <= safety * k
                else math.ceil(_HEX6_MAX * safety * k / n))

    return stratified_threshold_sample(
        df, by, id_col, hex6, thr, "long", k,
        rank_col=rank_col, max_strata=max_strata, order_key=key)


def weighted_bottomk_sample(df: DataFrame, by: list[str], id_col: str,
                            weight_col: str, k: int = 10,
                            salt: str = ":wsmp",
                            safety: float = 8.0,
                            rank_col: str = "smp_rank",
                            max_strata: int = 100_000) -> DataFrame:
    """Exact weight-proportional without-replacement k-sample per
    stratum (Efraimidis & Spirakis 2006, the exponential-race form) —
    the data-mixing primitive a training pipeline uses to sample
    documents proportional to a quality/importance score.

    Each row races with key ``e = -ln(u) / w`` where
    ``u = (24-bit md5(id||salt) prefix + 0.5) / 2^24`` — exact
    arithmetic, never 0 or 1, deterministic across runs and engines
    (the same portability argument as the weighted-HRW query: ln is
    the only inexact op and adjacent u values move e nine orders of
    magnitude more than a cross-engine ulp). The k smallest e per
    stratum are a weighted without-replacement sample: for k=1 the
    inclusion probability is w_i / sum(w) (the exponential race law,
    exact up to the 2^-24 u-quantization grid), and iterating
    removes the winner — the A-ES reservoir semantics, computed in
    one pass. Distinct ids CAN tie: e uses only the 24-bit digest
    prefix, so two ids with colliding prefixes and equal weights get
    identical keys — the scaffold's id tie-break is load-bearing,
    keeping the sample deterministic under collisions just as
    `bottomk_sample`'s full-digest ordering does.

    Scale shape via `stratified_threshold_sample`: e < thr
    survivors with ``thr = safety * k / W`` (W = stratum weight
    total; expected survivors = sum(1 - exp(-thr*w_i)) <= thr*W =
    safety*k), then the shortfall guard makes the result exact
    regardless of weight skew. Rows with NULL or non-positive
    weight never sample (weight 0 by definition).
    """
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
