"""Fellegi-Sunter probabilistic record linkage (G4), Spark-first.

Ref: the splink-based FERC1<->EIA plant linkage —
src/pudl/analysis/record_linkage/eia_ferc1_record_linkage.py:1-40
(model lifecycle: block -> comparison vector -> match weight ->
threshold + best-match rank) and eia_ferc1_model_config.py:12-103
(10 blocking rules; name / exact / percentage-difference / date
comparison levels).

Spark-first re-expression: every comparison level is a `when` chain
ending in a log2 Bayes-factor LITERAL (m/u probabilities are model
config — the reference trains them with splink's EM off labeled pairs,
a separate estimation pass; scoring is the runtime operator). The
match weight is then a plain sum of per-comparison columns and the
whole scorer compiles to one whole-stage-codegen projection — no UDF,
no shuffle beyond the candidate join itself.

Blocking mirrors the reference's multi-rule union: each rule is an
equi-join on derived keys (cheap shuffle or broadcast), unioned and
deduplicated on the pair key, exactly like splink's
`blocking_rules_to_generate_predictions`.

Name similarity uses levenshtein (built into both Spark and every SQL
oracle engine) as the engine-portable ratio; the reference's
jaro-winkler thresholds drop in as a pandas UDF where exact parity
with jellyfish is required.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bayes_factor_bits(m: float, u: float) -> float:
    """log2(m/u) — the weight a comparison level contributes."""
    return math.log2(m / u)


def similarity_ratio(left: Column, right: Column) -> Column:
    """1 - levenshtein/max-length in [0, 1]; 1.0 = identical."""
    return 1.0 - F.levenshtein(left, right) / F.greatest(
        F.length(left), F.length(right))


def _jaro_winkler_pair(s1: str, s2: str, prefix_weight: float = 0.1,
                       boost_threshold: float = 0.7) -> float:
    """Textbook Jaro-Winkler (Winkler 1990): Jaro similarity from
    windowed greedy matching + half-transposition count, then the
    Winkler common-prefix boost (<= 4 chars) applied only above the
    0.7 boost threshold. Semantics pinned to DuckDB's
    jaro_winkler_similarity (empty strings -> 0.0, boost gated on
    jaro > 0.7) so the SQL oracle reproduces the same doubles.
    """
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * l2
    matched1 = []
    matched2_idx = []
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                matched1.append(c)
                matched2_idx.append(j)
                break
    m = len(matched1)
    if m == 0:
        return 0.0
    matched2 = [s2[j] for j in sorted(matched2_idx)]
    mismatches = sum(a != b for a, b in zip(matched1, matched2))
    t = mismatches / 2.0
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > boost_threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * prefix_weight * (1.0 - jaro)
    return jaro


def _jaro_winkler_batch(a_list, b_list,
                        prefix_weight: float = 0.1,
                        boost_threshold: float = 0.7):
    """Batch-vectorized Jaro-Winkler: identical doubles to
    :func:`_jaro_winkler_pair` (cross-checked by property test), but
    the greedy window matching runs across the whole Arrow batch at
    once on padded code-point matrices — ~10x the throughput of the
    per-pair loop, which matters because linkage scores hundreds of
    thousands of candidate pairs per task.
    """
    import numpy as np

    n = len(a_list)
    if n == 0:
        return np.zeros(0)
    la = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=n)
    lam, lbm = max(int(la.max()), 1), max(int(lb.max()), 1)
    # one vectorized unicode conversion: numpy U-dtype arrays are
    # zero-padded UCS4, so a .view gives the (n, L) code-point
    # matrix directly — no per-string Python loop. 0 is the pad.
    A = np.array(a_list, dtype=f"U{lam}").view(np.uint32) \
        .reshape(n, lam).astype(np.uint16)
    B = np.array(b_list, dtype=f"U{lbm}").view(np.uint32) \
        .reshape(n, lbm).astype(np.uint16)
    # sort rows by descending subject length so iteration i touches
    # only the rows still active (la > i): total work becomes
    # sum(la) x LB instead of max(la) x N x LB.
    order = np.argsort(-la, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    A, B = A[order], B[order]
    las, lbs = la[order], lb[order]
    window = np.maximum(np.maximum(las, lbs) // 2 - 1, 0)
    jcols = np.arange(lbm, dtype=np.int64)[None, :]
    flags1 = np.zeros((n, lam), dtype=bool)
    avail = jcols < lbs[:, None]         # not yet matched, in-bounds
    for i in range(lam):
        k = int(np.searchsorted(-las, -(i + 1), side="right"))
        if k == 0:
            break
        # fused in-place mask build: equal char, unmatched, |j-i|<=w
        cand = B[:k] == A[:k, i:i + 1]
        cand &= avail[:k]
        cand &= np.abs(jcols - i) <= window[:k, None]
        has = cand.any(axis=1)
        rows = np.nonzero(has)[0]
        first = cand[rows].argmax(axis=1)
        avail[rows, first] = False
        flags1[:k, i] = has
    flags2 = (jcols < lbs[:, None]) & ~avail
    m = flags1.sum(axis=1)
    maxm = int(m.max()) if n else 0
    if maxm:
        # scatter matched chars into order-of-match sequence slots
        # (cumsum gives each matched char its k-index; no argsort)
        rows1, cols1 = np.nonzero(flags1)
        pos1 = (flags1.cumsum(axis=1) - 1)[rows1, cols1]
        rows2, cols2 = np.nonzero(flags2)
        pos2 = (flags2.cumsum(axis=1) - 1)[rows2, cols2]
        c1 = np.zeros((n, maxm), dtype=np.uint16)
        c2 = np.zeros((n, maxm), dtype=np.uint16)
        c1[rows1, pos1] = A[rows1, cols1]
        c2[rows2, pos2] = B[rows2, cols2]
        kmask = np.arange(maxm)[None, :] < m[:, None]
        mism = ((c1 != c2) & kmask).sum(axis=1)
    else:
        mism = np.zeros(n, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = mism / 2.0
        jaro = (m / las + m / lbs + (m - t) / np.maximum(m, 1)) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where((las == 0) | (lbs == 0), 0.0, jaro)
    # winkler prefix boost (<= 4 common chars), gated on jaro > 0.7
    pmax = min(4, lam, lbm)
    if pmax > 0:
        eq = (A[:, :pmax] == B[:, :pmax]) & \
            (np.arange(pmax)[None, :] < np.minimum(las, lbs)[:, None])
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    boosted = jaro + prefix * prefix_weight * (1.0 - jaro)
    # (no equality fast-path needed: m=l1=l2, t=0 gives exactly 1.0,
    # and the boost leaves 1.0 fixed — same doubles as the scalar)
    return np.where(jaro > boost_threshold, boosted, jaro)[inv]


def jaro_winkler(left: Column, right: Column) -> Column:
    """Jaro-Winkler similarity as an Arrow-batched pandas UDF (ref:
    the jaro_winkler_at_thresholds comparisons the splink model is
    calibrated on, eia_ferc1_record_linkage.py:36 and
    eia_ferc1_model_config.py:37-44). The kernel is batch-vectorized
    NumPy (:func:`_jaro_winkler_batch`) and runs AFTER blocking, on
    candidate pairs only, never on the cross product. NULL in ->
    NULL out, matching SQL semantics.
    """
    from pyspark.sql.functions import pandas_udf

    def _batch(l, r):
        import numpy as np
        import pandas as pd

        a = l.to_numpy(dtype=object)
        b = r.to_numpy(dtype=object)
        null = pd.isna(a) | pd.isna(b)
        a_str = np.where(null, "", a)
        b_str = np.where(null, "", b)
        vals = _jaro_winkler_batch(list(a_str), list(b_str))
        return pd.Series(np.where(null, np.nan, vals),
                         dtype="float64").where(~pd.Series(null), None)

    return pandas_udf(_batch, "double")(left, right)


def percentage_difference(left: Column, right: Column) -> Column:
    """|l-r| / max(|l|,|r|) (ref: PercentageDifferenceLevel,
    eia_ferc1_model_config.py:49-78)."""
    return F.abs(left - right) / F.greatest(F.abs(left), F.abs(right))


@dataclass(frozen=True)
class ComparisonLevel:
    """One γ-level: a predicate plus its m/u probabilities."""
    condition: Column | None  # None = the catch-all ELSE level
    m: float
    u: float


def comparison_column(left: Column, right: Column,
                      levels: list[ComparisonLevel]) -> Column:
    """First-match-wins level assignment -> log2 Bayes factor.

    NULL on either side contributes 0 bits (splink's NullLevel). The
    final level must be the catch-all (condition=None).
    """
    out = F.when(left.isNull() | right.isNull(), F.lit(0.0))
    for lv in levels[:-1]:
        out = out.when(lv.condition, F.lit(bayes_factor_bits(lv.m, lv.u)))
    last = levels[-1]
    if last.condition is not None:
        raise ValueError("last comparison level must be the catch-all")
    return out.otherwise(F.lit(bayes_factor_bits(last.m, last.u)))


def name_comparison(left: Column, right: Column,
                    thresholds=(0.9, 0.8, 0.7),
                    ms=(0.5, 0.3, 0.1, 0.05, 0.05),
                    us=(0.004, 0.01, 0.02, 0.05, 0.916),
                    method: str = "levenshtein") -> Column:
    """Exact / thresholded-similarity name comparison (ref:
    cl.NameComparison with jaro_winkler_thresholds=[0.9,0.8,0.7],
    eia_ferc1_model_config.py:37-44). m's and u's each sum to 1
    across levels (they are conditional distributions of γ).

    ``method='jaro_winkler'`` scores with the reference's calibrated
    similarity (rounded to 6dp before thresholding so the level
    assignment is engine-portable); the levenshtein default keeps the
    whole comparison inside whole-stage codegen.
    """
    if method == "jaro_winkler":
        sim = F.round(jaro_winkler(left, right), 6)
    elif method == "levenshtein":
        sim = similarity_ratio(left, right)
    else:
        raise ValueError(f"unknown name comparison method: {method}")
    levels = [ComparisonLevel(left == right, ms[0], us[0])]
    for i, t in enumerate(thresholds, start=1):
        levels.append(ComparisonLevel(sim >= t, ms[i], us[i]))
    levels.append(ComparisonLevel(None, ms[-1], us[-1]))
    return comparison_column(left, right, levels)


def exact_comparison(left: Column, right: Column,
                     m: float = 0.9, u: float = 0.04) -> Column:
    """ExactMatch comparison (ref: eia_ferc1_model_config.py:46-47)."""
    return comparison_column(left, right, [
        ComparisonLevel(left == right, m, u),
        ComparisonLevel(None, 1.0 - m, 1.0 - u),
    ])


def percentage_comparison(left: Column, right: Column,
                          thresholds=(1e-4, 0.05, 0.1),
                          ms=(0.4, 0.4, 0.15, 0.05),
                          us=(0.01, 0.19, 0.3, 0.5)) -> Column:
    """Banded percentage-difference comparison (ref: capacity_mw /
    net_generation_mwh comparisons, eia_ferc1_model_config.py:49-78)."""
    pct = percentage_difference(left, right)
    levels = [ComparisonLevel(pct < t, ms[i], us[i])
              for i, t in enumerate(thresholds)]
    levels.append(ComparisonLevel(None, ms[-1], us[-1]))
    return comparison_column(left, right, levels)


def block_candidates(left: DataFrame, right: DataFrame,
                     rules: list[list[str]],
                     left_key: str, right_key: str) -> DataFrame:
    """Multi-rule blocking: union of per-rule equi-joins, deduped on
    the (left_key, right_key) pair (ref: BLOCKING_RULES union,
    eia_ferc1_model_config.py:12-33). Each rule joins on columns that
    must exist in BOTH frames; the result carries only the pair keys —
    attributes re-attach afterward so the dedup shuffles the narrowest
    possible payload."""
    pairs = None
    for rule in rules:
        p = (left.select(left_key, *rule)
             .join(right.select(right_key, *rule), on=list(rule))
             .select(left_key, right_key))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.dropDuplicates([left_key, right_key])


def fellegi_sunter_weight(comparison_cols: list[Column],
                          prior: float = 0.001) -> Column:
    """Match weight in bits: log2 prior odds + Σ level factors.

    Probability = 2^w / (1 + 2^w); callers usually threshold on the
    weight directly (monotone in probability), which keeps the output
    an exact sum of literals — engine-portable bit-for-bit.
    """
    w = F.lit(math.log2(prior / (1.0 - prior)))
    for c in comparison_cols:
        w = w + c
    return w


def gamma_column(conditions: list[Column]) -> Column:
    """Discrete γ-level index for one comparison: first-match-wins
    over ``conditions`` (highest level first), catch-all level 0.

    ``conditions[0]`` assigns level ``len(conditions)``, the next
    ``len(conditions)-1``, … so higher agreement = higher index —
    splink's gamma convention. NULL on either side should be encoded
    by the caller as its own condition if it matters; otherwise NULLs
    fall through to level 0 (``when`` treats NULL predicates as
    false).
    """
    n = len(conditions)
    out = F.when(conditions[0], F.lit(n))
    for i, cond in enumerate(conditions[1:], start=1):
        out = out.when(cond, F.lit(n - i))
    return out.otherwise(F.lit(0))


@dataclass(frozen=True)
class EMParams:
    """Trained Fellegi-Sunter parameters.

    ``m[c][l]`` = P(γ_c = l | match); ``u[c][l]`` = P(γ_c = l |
    non-match); ``lam`` = estimated match proportion of the candidate
    pair population.
    """
    lam: float
    m: dict[str, list[float]]
    u: dict[str, list[float]]
    iters: int

    def bayes_bits(self, comparison: str, level: int) -> float:
        return math.log2(self.m[comparison][level]
                         / self.u[comparison][level])


def em_train(pairs: DataFrame, gamma_cols: dict[str, Column],
             n_levels: dict[str, int], lam0: float = 0.3,
             iters: int = 100, tol: float = 1e-9,
             smooth: float = 1e-6) -> EMParams:
    """Unsupervised EM estimation of Fellegi-Sunter m/u probabilities
    (ref: splink's estimate_parameters_using_expectation_maximisation,
    consumed by src/pudl/analysis/record_linkage/
    eia_ferc1_record_linkage.py:36-40 — the reference TRAINS its
    linkage model; scoring alone is `fellegi_sunter_weight`).

    Scale shape: ONE distributed aggregation — `groupBy(γ_1..γ_k)
    .count()` — reduces the pair population (billions at 100 TB) to
    its γ-pattern sufficient statistics (≤ ∏ n_levels rows, e.g.
    3×2×2 = 12). Every EM iteration is then driver-side numpy on that
    tiny table: per-pattern posterior P(match | γ) under conditional
    independence, then re-estimated λ, m, u. No per-iteration Spark
    job, no further shuffle.

    Deterministic: fixed init (λ = lam0; m ∝ level+1, u ∝
    n_levels−level so agreement is match-indicative at the start),
    fixed iteration cap, float64 throughout. ``smooth`` is Laplace
    smoothing that keeps zero-count levels from collapsing a
    probability to exactly 0 (log-undefined downstream).
    """
    comps = list(gamma_cols)
    pat_df = (pairs.select(*[gamma_cols[c].alias(f"__g_{c}")
                             for c in comps])
              .groupBy(*[f"__g_{c}" for c in comps]).count().collect())
    items = sorted((tuple(r[f"__g_{c}"] for c in comps), r["count"])
                   for r in pat_df)  # collect order-independent ULPs
    return em_train_from_counts([list(k) for k, _ in items],
                                [v for _, v in items], comps, n_levels,
                                lam0=lam0, iters=iters, tol=tol,
                                smooth=smooth)


def em_train_from_counts(patterns, counts, comps: list,
                         n_levels: dict[str, int], lam0: float = 0.3,
                         iters: int = 100, tol: float = 1e-9,
                         smooth: float = 1e-6) -> EMParams:
    """EM core over precomputed γ-pattern sufficient statistics —
    ``patterns`` is a list of per-pattern level tuples (one entry per
    comparison in ``comps``), ``counts`` the pair count of each
    pattern. `em_train` is exactly this after its one distributed
    aggregation; callers that already hold the pattern counts (e.g. a
    query that also needs labeled per-pattern tallies and shares ONE
    groupBy for both — guide §6.1 read amplification) call this
    directly and pay zero extra Spark jobs. Identical float64
    arithmetic, identical results.
    """
    import numpy as np

    patterns = np.array(patterns, dtype=np.int64).reshape(
        len(counts), len(comps))
    counts = np.array(counts, dtype=np.float64)

    lam = float(lam0)
    m = {c: np.array([(l + 1.0) for l in range(n_levels[c])]) for c in comps}
    u = {c: np.array([(n_levels[c] - l + 0.0) for l in range(n_levels[c])])
         for c in comps}
    for c in comps:
        m[c] /= m[c].sum()
        u[c] /= u[c].sum()

    n_total = counts.sum()
    it = 0
    for it in range(1, iters + 1):
        pm = np.full(len(counts), lam)
        pu = np.full(len(counts), 1.0 - lam)
        for j, c in enumerate(comps):
            pm *= m[c][patterns[:, j]]
            pu *= u[c][patterns[:, j]]
        w = pm / (pm + pu)
        new_lam = float((w * counts).sum() / n_total)
        delta = abs(new_lam - lam)
        wm = w * counts
        wu = (1.0 - w) * counts
        for j, c in enumerate(comps):
            nm = np.bincount(patterns[:, j], weights=wm,
                             minlength=n_levels[c]) + smooth
            nu = np.bincount(patterns[:, j], weights=wu,
                             minlength=n_levels[c]) + smooth
            nm /= nm.sum()
            nu /= nu.sum()
            delta = max(delta, float(np.abs(nm - m[c]).max()),
                        float(np.abs(nu - u[c]).max()))
            m[c], u[c] = nm, nu
        lam = new_lam
        if delta < tol:
            break
    return EMParams(lam=lam,
                    m={c: [float(x) for x in m[c]] for c in comps},
                    u={c: [float(x) for x in u[c]] for c in comps},
                    iters=it)


def score_with_em(gamma_cols: dict[str, Column], params: EMParams,
                  prior: float | None = None) -> Column:
    """Match weight scored with TRAINED parameters: each comparison's
    γ level looks up its EM-estimated log2 Bayes factor through a
    literal `when` chain, so the scorer stays one whole-stage-codegen
    projection exactly like the hand-set `fellegi_sunter_weight`
    path — training changes the literals, not the plan shape.

    ``prior`` defaults to the EM-estimated match proportion λ.
    """
    lam = params.lam if prior is None else prior
    w = F.lit(math.log2(lam / (1.0 - lam)))
    for c, g in gamma_cols.items():
        levels = len(params.m[c])
        expr = F.when(g == 0, F.lit(params.bayes_bits(c, 0)))
        for lv in range(1, levels):
            expr = expr.when(g == lv, F.lit(params.bayes_bits(c, lv)))
        w = w + F.coalesce(expr, F.lit(0.0))
    return w
