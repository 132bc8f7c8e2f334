"""Property-based tests (hypothesis — the reference uses the same
strategy in tests/unit/transform/ferc1_test.py): conservation and
round-trip invariants that must hold for ANY input, not just the
fixtures."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pudl_spark.operators.allocate import allocate_proportionally
from pudl_spark.operators.dates import normalize_year_fragments

SLOW = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@st.composite
def allocation_groups(draw):
    """A group of rows: total + per-row basis (each may be missing)."""
    n = draw(st.integers(min_value=1, max_value=6))
    total = draw(st.floats(min_value=0, max_value=1e6,
                           allow_nan=False, width=32))
    basis = draw(st.lists(
        st.one_of(st.none(),
                  st.floats(min_value=0, max_value=1e5,
                            allow_nan=False, width=32)),
        min_size=n, max_size=n))
    return total, basis


@SLOW
@given(groups=st.lists(allocation_groups(), min_size=1, max_size=4))
def test_allocation_conserves_totals(spark, groups):
    """Σ allocations per group == group total (the reference's
    conservation check, analysis/allocate_gen_fuel.py:63-68) in every
    ALL/SOME/NONE coverage case — unless all bases AND fallbacks are
    zero-weight with a zero remainder edge (excluded by construction
    here: fallback weight is 1).
    """
    rows = []
    for gi, (total, basis) in enumerate(groups):
        for b in basis:
            rows.append((f"g{gi}", float(total), b))
    df = spark.createDataFrame(rows, "g string, total double, basis double")
    out = allocate_proportionally(df, ["g"], "total", "basis")
    got = {r["g"]: r["s"] for r in
           out.groupBy("g").agg(F.sum("allocated").alias("s")).collect()}
    for gi, (total, basis) in enumerate(groups):
        reported = [b for b in basis if b is not None]
        s = got[f"g{gi}"]
        if reported and sum(reported) > total:
            # over-reporting: reporters scale down to exactly total
            assert s == pytest.approx(total, rel=1e-9, abs=1e-6)
        else:
            assert s == pytest.approx(total, rel=1e-9, abs=1e-6)


@SLOW
@given(years=st.lists(st.integers(min_value=1970, max_value=2069),
                      min_size=1, max_size=20))
def test_year_fragment_roundtrip(spark, years):
    """Two-digit fragments of years in [earliest, earliest+100) repair
    to the original year exactly."""
    df = spark.createDataFrame(
        [(i, f"{y % 100:02d}") for i, y in enumerate(years)],
        "i int, y string")
    out = normalize_year_fragments(df, "y", earliest_year=1970)
    got = {r["i"]: r["y"] for r in out.collect()}
    for i, y in enumerate(years):
        assert got[i] == y


@SLOW
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False, width=32),
                     min_size=1, max_size=41, unique=True))
def test_unweighted_quantile_matches_numpy(spark, vals):
    """weighted_quantile (the dbt macro's pooled-tie interpolation) at
    q=0.5 with unit weights equals numpy's median whenever values are
    DISTINCT and the count is ODD — the definitions coincide exactly
    there (ties pool and even counts interpolate differently by
    design, matching the reference macro, not numpy).
    """
    import numpy as np

    from pudl_spark.operators.aggregate import weighted_quantile

    if len(vals) % 2 == 0:
        vals = vals[:-1]
    df = spark.createDataFrame([(v, 1.0) for v in vals], "x double, w double")
    got = weighted_quantile(df, "x", "w", 0.5).collect()[0]["weighted_quantile"]
    expect = float(np.median(np.array(vals, dtype="float64")))
    assert math.isclose(got, expect, rel_tol=1e-9, abs_tol=1e-9)


@st.composite
def asof_instances(draw):
    n_left = draw(st.integers(min_value=1, max_value=8))
    n_right = draw(st.integers(min_value=0, max_value=8))
    key = st.sampled_from(["k1", "k2"])
    ts = st.integers(min_value=0, max_value=20)
    left = [(draw(key), i, draw(ts)) for i in range(n_left)]
    right = [(draw(key), draw(ts), float(i)) for i in range(n_right)]
    return left, right


@SLOW
@given(inst=asof_instances())
def test_asof_join_matches_bruteforce(spark, inst):
    """asof_join == for each left row, the max right ts <= left ts per
    key (ties: any of the equal-ts right rows after dedup; instances
    dedup right on (key, ts) to keep the reference single-valued)."""
    import datetime as dt

    from pudl_spark.operators.joins import asof_join

    left_rows, right_rows = inst
    # dedup right on (key, ts), keep the smallest value (deterministic)
    rmap = {}
    for k, t, v in right_rows:
        if (k, t) not in rmap or v < rmap[(k, t)]:
            rmap[(k, t)] = v
    base = dt.datetime(2024, 1, 1)

    def at(h):
        return base + dt.timedelta(hours=h)

    left = spark.createDataFrame(
        [(k, i, at(t)) for k, i, t in left_rows],
        "k string, lid long, ts timestamp")
    right = spark.createDataFrame(
        [(k, at(t), v) for (k, t), v in rmap.items()],
        "k string, rts timestamp, val double") if rmap else \
        spark.createDataFrame([], "k string, rts timestamp, val double")
    got = {r["lid"]: r["asof_val"]
           for r in asof_join(left, right, ["k"], "ts", "rts",
                              ["val"]).collect()}
    for k, lid, t in left_rows:
        cands = [(rt, v) for (rk, rt), v in rmap.items()
                 if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (k, lid, t, cands)


@SLOW
@given(
    lefts=st.lists(st.floats(min_value=-100, max_value=100,
                             allow_nan=False), min_size=1, max_size=8),
    rights=st.lists(st.floats(min_value=-100, max_value=100,
                              allow_nan=False), min_size=1, max_size=8),
    tol=st.sampled_from([0.5, 3.0, 10.0]),
)
def test_banded_join_matches_bruteforce(spark, lefts, rights, tol):
    """banded_value_join finds EXACTLY the pairs with |l-r| <= tol
    (bucket blocking is complete and duplicate-free), including
    negative values and bucket-boundary straddles."""
    from pudl_spark.operators.joins import banded_value_join

    ldf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(lefts)], "lid long, lv double")
    rdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rights)], "rid long, rv double")
    got = sorted((r["lid"], r["rid"]) for r in
                 banded_value_join(ldf, rdf, "lv", "rv", tol).collect())
    want = sorted((i, j) for i, lv in enumerate(lefts)
                  for j, rv in enumerate(rights) if abs(lv - rv) <= tol)
    assert got == want


@SLOW
@given(
    members=st.lists(st.text(min_size=0, max_size=30), min_size=1,
                     max_size=40, unique=True),
    probes=st.lists(st.text(min_size=0, max_size=30), min_size=1,
                    max_size=40, unique=True),
)
def test_bloom_dedup_exact_for_any_strings(spark, members, probes):
    """Bloom-prefiltered incremental dedup must be EXACT for arbitrary
    member/probe strings (including empty strings, unicode, and heavy
    member/probe overlap): the filter may only shrink the confirm
    join's input, never the answer."""
    from pudl_spark.functions.bloom import bloom_incremental_dedup

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(members)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(probes)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["is_dup"] for r in bloom_incremental_dedup(
        corpus, batch, "doc_id", "text", num_bits=1 << 10, k=3).collect()}
    member_set = set(members)
    assert got == {1000 + i: t in member_set for i, t in enumerate(probes)}


@SLOW
@given(vals=st.lists(st.floats(min_value=-1e9, max_value=1e9,
                               allow_nan=False, allow_infinity=False),
                     min_size=1, max_size=200),
       qs=st.lists(st.floats(min_value=0.001, max_value=1.0,
                             allow_nan=False),
                   min_size=1, max_size=3, unique=True),
       nb=st.sampled_from([2, 4, 16]),
       cap=st.sampled_from([1, 8, 10**6]))
def test_exact_quantiles_is_the_order_statistic(spark, vals, qs, nb, cap):
    """For ANY values/quantiles/bucket-count/slice-cap, the result is
    exactly the k = max(1, ceil(q*n))-th smallest value — the
    narrowing loop, stall guard and rank offsets must never drift."""
    from pudl_spark.operators.aggregate import exact_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["quantile"]: (r["qrank"], r["value"])
           for r in exact_quantiles(df, "x", qs, num_buckets=nb,
                                    max_slice_rows=cap).collect()}
    s = sorted(vals)
    want = {}
    for q in qs:
        k = max(1, math.ceil(float(q) * len(s)))
        want[float(q)] = (k, s[k - 1])
    assert got == want


@st.composite
def sampler_instances(draw):
    """Random (stratum, id, weight) rows: strata from a tiny alphabet
    incl. NULL (the eqNullSafe path), distinct ids, positive int
    weights (exact brute-force arithmetic)."""
    ids = draw(st.lists(st.integers(min_value=0, max_value=10**6),
                        min_size=1, max_size=40, unique=True))
    rows = []
    for i in ids:
        stratum = draw(st.sampled_from([None, "a", "b", "c"]))
        w = draw(st.integers(min_value=1, max_value=1000))
        rows.append((stratum, i, w))
    k = draw(st.integers(min_value=1, max_value=5))
    guard = draw(st.booleans())  # tiny safety -> shortfall path
    return rows, k, (1e-9 if guard else 8.0)


@SLOW
@given(inst=sampler_instances())
def test_unified_samplers_equal_brute_force_for_any_input(spark, inst):
    """The r12-unified scaffold (stratified_threshold_sample) must
    reproduce the definitional per-stratum bottom-k for BOTH race
    keys on arbitrary inputs — any strata mix (incl. NULL), any k,
    both the prefilter and the shortfall-guard regimes."""
    import hashlib

    from pudl_spark.functions.sampling import (
        bottomk_sample, weighted_bottomk_sample,
    )

    rows, k, safety = inst
    df = spark.createDataFrame(rows,
                               "lang string, doc_id long, w long")

    def brute(key_fn):
        strata = {}
        for lang, i, w in rows:
            key = key_fn(i, w)
            if key is not None:
                strata.setdefault(lang, []).append((key, i))
        return {(lang, i, rn + 1)
                for lang, keyed in strata.items()
                for rn, (_, i) in enumerate(sorted(keyed)[:k])}

    got_u = set(map(tuple, bottomk_sample(
        df, ["lang"], "doc_id", k=k, safety=safety).select(
        "lang", "doc_id", "smp_rank").collect()))
    assert got_u == brute(
        lambda i, w: hashlib.md5(f"{i}:smp".encode()).hexdigest())

    def wkey(i, w):
        hex6 = int(hashlib.md5(
            f"{i}:wsmp".encode()).hexdigest()[:6], 16)
        return -math.log((hex6 + 0.5) / 16 ** 6) / float(w)

    got_w = set(map(tuple, weighted_bottomk_sample(
        df, ["lang"], "doc_id", "w", k=k, safety=safety).select(
        "lang", "doc_id", "smp_rank").collect()))
    assert got_w == brute(wkey)
