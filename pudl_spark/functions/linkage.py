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
                    us=(0.004, 0.01, 0.02, 0.05, 0.916)) -> Column:
    """Exact / thresholded-similarity name comparison (ref:
    cl.NameComparison with jaro_winkler_thresholds=[0.9,0.8,0.7],
    eia_ferc1_model_config.py:37-44). m's and u's each sum to 1
    across levels (they are conditional distributions of γ)."""
    sim = similarity_ratio(left, right)
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
