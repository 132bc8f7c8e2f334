"""Property-based differential fuzzing of the dbt-validation layer
(r14): hypothesis generates small random frames — NULL-heavy keys,
integer-valued measures so every sum is exact in any execution order —
and each check runs against a literal SQL twin of its reference macro
in DuckDB. Exact equality, same discipline as test_differential_fuzz.
This closes the gap the composite's fixed configuration can't: the
checks' NULL/zero/empty edge rules under arbitrary data shapes.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

KEYS = ["a", "b", "c", None]
VALS = [0, 1, 2, 5, None]


def _frame(rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "x", "y"])
    # nullable ints keep NULLs distinct from NaN for duckdb
    for c in ("v", "x", "y"):
        pdf[c] = pdf[c].astype("Int64")
    return pdf


def _spark_frame(spark, pdf):
    rows = [tuple(None if pd.isna(v) else (int(v) if c != "k" else v)
                  for c, v in zip(pdf.columns, r))
            for r in pdf.itertuples(index=False)]
    return spark.createDataFrame(
        rows, "k string, v long, x long, y long")


row_st = st.tuples(st.sampled_from(KEYS), st.sampled_from(VALS),
                   st.sampled_from(VALS), st.sampled_from(VALS))
rows_st = st.lists(row_st, min_size=0, max_size=12)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st)
def test_one_value_per_key_matches_sql(spark, rows):
    from pudl_spark.validate import check_one_value_per_key

    pdf = _frame(rows)
    got = sorted((r["key_value"], r["distinct_count"]) for r in
                 check_one_value_per_key(
                     _spark_frame(spark, pdf), "k", "v").collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute(
        "SELECT k, count(DISTINCT v) FROM t WHERE k IS NOT NULL "
        "GROUP BY k HAVING count(DISTINCT v) > 1").fetchall()))
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st,
       hi=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
def test_missingness_between_matches_sql(spark, rows, hi):
    from pudl_spark.validate import check_missingness_between

    pdf = _frame(rows)
    got = check_missingness_between(
        _spark_frame(spark, pdf), "v", 0.0, hi).count()
    con = duckdb.connect()
    con.register("t", pdf)
    # the reference computes the exact ratio and passes empty input
    # (NULLIF denominator); both engines evaluate the identical
    # double expression
    want = con.execute(
        "SELECT count(*) FROM ("
        "  SELECT CAST(count(*) - count(v) AS DOUBLE)"
        "         / NULLIF(count(*), 0) AS p FROM t)"
        f" WHERE p < 0.0 OR p > {hi}").fetchone()[0]
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st,
       ratio=st.sampled_from([0.5, 1.0, 2.0]))
def test_columns_ratio_matches_sql(spark, rows, ratio):
    from pudl_spark.validate import check_columns_ratio

    pdf = _frame(rows)
    got = check_columns_ratio(
        _spark_frame(spark, pdf), "x", "y", max_ratio=ratio).count()
    con = duckdb.connect()
    con.register("t", pdf)
    # zero/NULL denominators pass (the macro's explicit rule);
    # integer division exactness: x/y on small ints is the same
    # double in both engines
    want = con.execute(
        "SELECT count(*) FROM t WHERE y IS NOT NULL AND y <> 0 "
        f"AND CAST(x AS DOUBLE) / y > {ratio}").fetchone()[0]
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st,
       cap=st.sampled_from([0, 2, 4, 7]))
def test_summed_columns_threshold_matches_sql(spark, rows, cap):
    from pudl_spark.validate import (
        check_summed_columns_not_exceed_threshold,
    )

    pdf = _frame(rows)
    df = _spark_frame(spark, pdf).withColumn(
        "cap", F.lit(cap).cast("long"))
    got = check_summed_columns_not_exceed_threshold(
        df, "x", "y", "cap").count()
    con = duckdb.connect()
    con.register("t", pdf)
    # NULL sums pass (x + y IS NULL when either is)
    want = con.execute(
        "SELECT count(*) FROM t WHERE x + y IS NOT NULL "
        f"AND x + y > {cap}").fetchone()[0]
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st, rows2=rows_st)
def test_combination_coverage_matches_except(spark, rows, rows2):
    """The NULL-safe anti-join must replay SQL EXCEPT's NULL
    semantics exactly — the adversarial case the r13 NULL-safety fix
    exists for (NULL-keyed combinations present on both sides are
    NOT missing)."""
    from pudl_spark.validate import (
        check_includes_all_value_combinations_from,
    )

    def key(p):
        return ((p[0] is None, p[0] or ""), (p[1] is None, p[1] or 0))

    model, compare = _frame(rows), _frame(rows2)
    got = sorted(
        (((None if r["k"] is None else r["k"]),
          (None if r["v"] is None else r["v"])) for r in
         check_includes_all_value_combinations_from(
             _spark_frame(spark, model), _spark_frame(spark, compare),
             ["k", "v"]).collect()), key=key)
    con = duckdb.connect()
    con.register("m", model)
    con.register("c", compare)
    want = sorted(
        ((k, None if pd.isna(v) else int(v)) for k, v in con.execute(
            "SELECT DISTINCT k, v FROM c "
            "EXCEPT SELECT DISTINCT k, v FROM m").fetchall()),
        key=key)
    assert got == want


CATS = ["fuel", "labor", "rebate", "total", None]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["e1", "e2"]), st.sampled_from(CATS),
              st.sampled_from(VALS)), min_size=0, max_size=12))
def test_subcomponents_case_order_matches_sql(spark, rows):
    """The reference's CASE order — explicit positives win over
    negatives, negatives subtract, everything else ignored — replayed
    literally in DuckDB. Integer values keep every sum exact."""
    from pudl_spark.validate import check_subcomponents_sum_to_total

    pdf = pd.DataFrame(rows, columns=["e", "cat", "v"])
    pdf["v"] = pdf["v"].astype("Int64")
    sdf = spark.createDataFrame(
        [tuple(None if pd.isna(x) else
               (int(x) if i == 2 else x) for i, x in enumerate(r))
         for r in pdf.itertuples(index=False)],
        "e string, cat string, v long")
    got = sorted(
        (r["e"], r["subcomponents_sum"], r["grand_total"]) for r in
        check_subcomponents_sum_to_total(
            sdf, ["e"], "cat", "v", "total", tolerance=0,
            subcomponents=["fuel", "labor", "rebate"],
            negative_subcomponents=["rebate", "labor"]).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    # CASE order exactly as the reference macro writes it: the
    # positive listing is the FIRST branch, so rebate/labor in both
    # lists count POSITIVE
    want = sorted(map(tuple, con.execute("""
        WITH g AS (
          SELECT e, cat, sum(v) AS total FROM t GROUP BY e, cat
        ), s AS (
          SELECT e,
            sum(CASE
              WHEN cat IN ('fuel', 'labor', 'rebate') THEN total
              WHEN cat IN ('rebate', 'labor') THEN -total
            END) AS subcomponents_sum,
            max(CASE WHEN cat = 'total' THEN total END) AS grand_total
          FROM g GROUP BY e)
        SELECT e, CAST(subcomponents_sum AS BIGINT),
               CAST(grand_total AS BIGINT)
        FROM s WHERE abs(subcomponents_sum - grand_total) > 0
        """).fetchall()))
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]),
              st.sampled_from([2020, 2021, 2022, 2023]),
              st.sampled_from([0, 1, 2, 4, 9])),
    min_size=0, max_size=10, unique_by=lambda r: (r[0], r[1])))
def test_change_within_ratio_matches_sql(spark, rows):
    """Lag-window pct-change with the reference's zero-previous rule
    (NULL pct_change passes) against the literal SQL twin."""
    from pudl_spark.validate import check_column_change_within_ratio

    pdf = pd.DataFrame(rows, columns=["g", "yr", "n"])
    sdf = spark.createDataFrame(
        [(r.g, int(r.yr), float(r.n))
         for r in pdf.itertuples(index=False)],
        "g string, yr int, n double")
    got = check_column_change_within_ratio(
        sdf, "n", "g", "yr", max_pct_change=0.5).count()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("""
        SELECT count(*) FROM (
          SELECT CASE WHEN prev <> 0
                      THEN abs((n - prev) / prev) END AS pc, prev
          FROM (
            SELECT CAST(n AS DOUBLE) AS n,
              LAG(CAST(n AS DOUBLE)) OVER (
                PARTITION BY g ORDER BY yr) AS prev
            FROM t))
        WHERE prev IS NOT NULL AND pc > 0.5""").fetchone()[0]
    assert got == want


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]),
              st.sampled_from([1.0, 2.0, 2.0, 5.0, 7.5, 10.0, None]),
              st.sampled_from([0.0, 0.5, 1.0, 3.0, -1.0, None])),
    min_size=1, max_size=14),
    q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]))
def test_weighted_quantile_matches_bruteforce(spark, rows, q):
    """The pooled-tie interpolated weighted quantile — the single
    most numerically subtle operator in the validation layer
    (dbt/macros/weighted_quantile.sql twin) — against a literal
    Python transcription of its definition: pool ties, cum =
    (cumsum(w) - w/2)/total over value order, clamp to the first/
    last value outside the cum range, interpolate between brackets.
    Random ties, zero/negative/NULL weights (all dropped), NULL
    values, per-group frames, boundary quantiles 0 and 1."""
    from pudl_spark.operators.aggregate import weighted_quantile

    def brute(pairs):
        agg = {}
        for x, w in pairs:
            if x is None or w is None or w <= 0:
                continue
            agg[x] = agg.get(x, 0.0) + w
        if not agg:
            return None
        xs = sorted(agg)
        total = sum(agg[x] for x in xs)
        cums, run = [], 0.0
        for x in xs:
            run += agg[x]
            cums.append((run - agg[x] / 2) / total)
        if q <= cums[0]:
            return xs[0]
        if q >= cums[-1]:
            return xs[-1]
        for i in range(1, len(xs)):
            if cums[i - 1] < q <= cums[i]:
                return (xs[i - 1] + (xs[i] - xs[i - 1])
                        * (q - cums[i - 1]) / (cums[i] - cums[i - 1]))

    df = spark.createDataFrame(rows, "g string, x double, w double")
    got = {r["g"]: r["wq"] for r in weighted_quantile(
        df, "x", "w", q, by=["g"], out_col="wq").collect()}
    for g in ("g1", "g2"):
        want = brute([(x, w) for gg, x, w in rows if gg == g])
        if want is None:
            assert g not in got
        else:
            assert g in got, (g, rows)
            assert abs(got[g] - want) < 1e-9, (g, got[g], want)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1, max_size=24))
def test_connected_components_matches_union_find(spark, edges):
    """Pointer-jumping CC against a literal union-find on random
    graphs: self-loops, parallel/reversed edges, long chains, cycles
    and multi-component shapes all arise in the strategy. Component
    label must be the MIN node id of the component — exactly the
    operator's contract — and every endpoint must be labeled."""
    from pudl_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # min-id labeling: union-find roots here are already the min id
    # of their set because unions always point the larger root at
    # the smaller one
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in
           connected_components(df).collect()}
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 15),
              st.sampled_from(["a", "b", None])),
    min_size=1, max_size=14,
    unique_by=lambda r: (r[0], r[1])))
def test_make_changelog_matches_bruteforce(spark, rows):
    """SCD2 changelog against a literal Python scan: keep the first
    row of each value-change run (NULL-safe comparison — a None->None
    step is NOT a change), valid_until = next kept row's date.
    Random keys, dates and NULL-bearing values."""
    from pudl_spark.operators.windows import make_changelog

    def brute(seq):
        kept, prev = [], object()
        for d, v in sorted(seq):
            if not kept or not (v == prev
                                or (v is None and prev is None)):
                kept.append([d, v, None])
            prev = v
        for i in range(len(kept) - 1):
            kept[i][2] = kept[i + 1][0]
        return {(k[0], k[1], k[2]) for k in kept}

    df = spark.createDataFrame(rows, "k string, d long, v string")
    got = {}
    for r in make_changelog(df, ["k"], "d", ["v"]).collect():
        got.setdefault(r["k"], set()).add(
            (r["d"], r["v"], r["valid_until_date"]))
    for k in ("k1", "k2"):
        seq = [(d, v) for kk, d, v in rows if kk == k]
        want = brute(seq)
        assert got.get(k, set()) == want, (k, got.get(k), want)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(src1=st.lists(st.tuples(st.integers(1, 3),
                               st.sampled_from(["x", "y", None]),
                               st.sampled_from([1, 2, None])),
                     min_size=0, max_size=8),
       src2=st.lists(st.tuples(st.integers(1, 3),
                               st.sampled_from(["x", "y", "z", None]),
                               st.sampled_from([1, 5, None])),
                     min_size=0, max_size=8))
def test_harvest_voting_matches_bruteforce(spark, src1, src2):
    """The harvesting vote — PUDL's most distinctive semantics —
    against a literal tally: per (pk, column), NULLs abstain, top-1
    by count with smallest-value tie-break, `most_frequent` always
    keeps, `most_and_more_frequent` needs consistency >= 0.7,
    `unique` needs unanimity; `sum` ignores NULLs. Two random
    sources with overlapping keys."""
    from pudl_spark.operators.harvest import harvest

    schema = "k long, a string, m long"
    sources = {
        "s1": spark.createDataFrame(src1, schema),
        "s2": spark.createDataFrame(src2, schema),
    }
    res = harvest(sources, ["k"],
                  {"a": "most_and_more_frequent", "m": "sum"},
                  min_frequency=0.7)
    got = {r["k"]: (r["a"], r["m"]) for r in res.entity.collect()}

    rows = src1 + src2
    keys = {r[0] for r in rows}
    want = {}
    for k in keys:
        votes = {}
        for kk, a, _ in rows:
            if kk == k and a is not None:
                votes[a] = votes.get(a, 0) + 1
        a_out = None
        if votes:
            total = sum(votes.values())
            top = sorted(votes.items(),
                         key=lambda kv: (-kv[1], kv[0]))[0]
            if top[1] / total >= 0.7:
                a_out = top[0]
        ms = [m for kk, _, m in rows if kk == k and m is not None]
        want[k] = (a_out, sum(ms) if ms else None)
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(
    st.tuples(st.sampled_from([2019, 2020, 2021, None]),
              st.sampled_from([2019, 2020, 2021, None])),
    min_size=0, max_size=12),
    thr=st.sampled_from([0.0, 0.001, 0.25, 0.5]))
def test_consistent_years_matches_sql(spark, pairs, thr):
    """check_consistent_years vs a literal DuckDB twin of
    expect_consistent_years.sql. Structured fields compare exactly;
    the ratio compares within 1e-6 and the failure_reason string is
    NOT byte-compared here because the macro's CAST(... AS FLOAT) is
    float32 in DuckDB while Spark computes float64 — the rendered
    5-decimal rounding can differ in the last digit (e.g. 5/6). The
    exact string format is pinned byte-for-byte in
    test_validate_and_forest.py::test_consistent_years on an
    f32-safe ratio."""
    import datetime

    from pudl_spark.validate import check_consistent_years

    rows = [(None if a is None
             else datetime.datetime(a, 6, 15, 12, 0, 0),
             None if b is None else datetime.date(b, 3, 1))
            for a, b in pairs]
    sdf = spark.createDataFrame(rows, "dt timestamp, d date")
    got = check_consistent_years(sdf, "dt", "d", thr).collect()

    pdf = pd.DataFrame(rows, columns=["dt", "d"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"""
        WITH year_comparison AS (
            SELECT CASE WHEN EXTRACT(YEAR FROM CAST(dt AS TIMESTAMP))
                             != EXTRACT(YEAR FROM CAST(d AS DATE))
                        THEN 1 ELSE 0 END AS is_mismatch
            FROM t WHERE dt IS NOT NULL AND d IS NOT NULL),
        mismatch_stats AS (
            SELECT COUNT(*) AS total_records,
                   SUM(is_mismatch) AS mismatched_records,
                   CASE WHEN COUNT(*) > 0
                        THEN CAST(SUM(is_mismatch) AS FLOAT)
                             / COUNT(*)
                        ELSE 0 END AS mismatch_ratio
            FROM year_comparison)
        SELECT total_records, mismatched_records, mismatch_ratio
        FROM mismatch_stats WHERE mismatch_ratio > {thr}
    """).fetchall()
    assert len(got) == len(want)
    if got:
        g, w = got[0], want[0]
        assert g["total_records"] == w[0]
        assert g["mismatched_records"] == w[1]
        assert abs(g["mismatch_ratio"] - w[2]) < 1e-6
        assert g["max_allowed_ratio"] == thr
        assert g["failure_reason"].startswith("Found ")
        assert (f"({g['mismatched_records']} of "
                f"{g['total_records']})") in g["failure_reason"]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(parts=st.lists(st.sampled_from(["a", "b", "", None]),
                      min_size=0, max_size=12),
       exp=st.dictionaries(st.sampled_from(["a", "b", "", "c"]),
                           st.integers(0, 4), max_size=4))
def test_row_counts_per_partition_matches_macro(spark, parts, exp):
    """check_row_counts_per_partition vs the LITERAL
    row_counts_per_partition macro in DuckDB — including the r15
    raw-GROUP-BY parity fix: NULL and '' partition values group
    separately, then coalesce in the SELECT, so both engines emit
    one violation row per (expected x observed) '' match."""
    from pudl_spark.validate import check_row_counts_per_partition

    sdf = spark.createDataFrame([(p,) for p in parts], "part string")
    got = sorted(
        (r["part"], r["actual_count"], r["expected_count"])
        for r in check_row_counts_per_partition(
            sdf, "part", dict(exp)).collect())

    pdf = pd.DataFrame({"part": pd.array(parts, dtype="string")})
    con = duckdb.connect()
    con.register("model", pdf)
    con.execute("CREATE TABLE rc(table_name VARCHAR, "
                "partition VARCHAR, row_count BIGINT)")
    for k, v in exp.items():
        con.execute("INSERT INTO rc VALUES ('t', ?, ?)", [k, v])
    want = sorted(map(tuple, con.execute("""
        WITH expected AS (
            SELECT COALESCE(CAST(partition AS VARCHAR), '')
                       AS partition,
                   row_count AS expected_count
            FROM rc WHERE table_name = 't'),
        observed AS (
            SELECT COALESCE(CAST(part AS VARCHAR), '') AS partition,
                   COUNT(*) AS observed_count
            FROM model GROUP BY part)
        SELECT COALESCE(expected.partition, observed.partition),
               observed_count, expected_count
        FROM expected FULL OUTER JOIN observed
          ON expected.partition = observed.partition
        WHERE expected_count != observed_count
           OR expected_count IS NULL OR observed_count IS NULL
    """).fetchall()))
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st, parents=st.lists(st.sampled_from(VALS),
                                      min_size=0, max_size=6))
def test_foreign_key_df_matches_sql(spark, rows, parents):
    """check_foreign_key_df vs the anti-join twin: NULL child keys
    are excluded (SQL NOT IN would nuke the result on a NULL
    parent, so the twin spells the anti-join out)."""
    from pudl_spark.validate import check_foreign_key_df

    pdf = _frame(rows)
    parent = spark.createDataFrame(
        [(None if p is None else int(p),) for p in parents]
        or [(None,)], "pk long")
    got = sorted(r["v"] for r in check_foreign_key_df(
        _spark_frame(spark, pdf), ["v"], parent, ["pk"]).collect())
    ppdf = pd.DataFrame(
        {"pk": pd.array(parents if parents else [None],
                        dtype="Int64")})
    con = duckdb.connect()
    con.register("child", pdf)
    con.register("parent", ppdf)
    want = sorted(r[0] for r in con.execute(
        "SELECT DISTINCT v FROM child WHERE v IS NOT NULL "
        "AND NOT EXISTS (SELECT 1 FROM parent "
        "                WHERE parent.pk = child.v)").fetchall())
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st,
       lo=st.sampled_from([0.0, 0.25, 0.5]),
       hi=st.sampled_from([0.5, 0.75, 1.0]))
def test_column_fraction_with_condition_matches_sql(spark, rows,
                                                    lo, hi):
    """check_column_fraction_with_condition vs the reference CTE:
    integer-valued weights make both engines' sums exact, the raw
    f64 fraction is the identical expression on both sides (so the
    violation VERDICT matches exactly), and a zero/NULL total sum
    passes (try_divide / NULLIF parity)."""
    from pudl_spark.validate import (
        check_column_fraction_with_condition,
    )

    pdf = _frame(rows)
    got = check_column_fraction_with_condition(
        _spark_frame(spark, pdf), "v", "x >= 1", lo, hi).collect()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"""
        WITH s AS (
            SELECT SUM(CASE WHEN x >= 1 THEN v ELSE 0 END) AS num,
                   SUM(v) AS den
            FROM t)
        SELECT CAST(num AS DOUBLE) / NULLIF(den, 0) AS f,
               num, den FROM s
        WHERE CAST(num AS DOUBLE) / NULLIF(den, 0) < {lo}
           OR CAST(num AS DOUBLE) / NULLIF(den, 0) > {hi}
    """).fetchall()
    assert len(got) == len(want)
    if got:
        g, w = got[0], want[0]
        assert abs(g["actual_fraction"] - round(w[0], 4)) < 1e-9
        assert g["condition_sum"] == float(w[1])
        assert g["total_sum"] == float(w[2])
        assert (g["min_fraction"], g["max_fraction"]) == (lo, hi)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st)
def test_columns_are_close_matches_sql(spark, rows):
    """check_columns_are_close vs the row-wise SQL twin: both-NULL
    passes, one-sided NULL propagates to a NULL predicate and
    passes (three-valued logic parity), equal/distant values split
    on the identical |a-b| <= tol*GREATEST(|a|,|b|) expression."""
    from pudl_spark.validate import check_columns_are_close

    pdf = _frame(rows)
    got = sorted((r["x"], r["y"]) for r in check_columns_are_close(
        _spark_frame(spark, pdf), "x", "y", rel_tol=1e-6).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute("""
        SELECT x, y FROM t
        WHERE NOT ((x IS NULL AND y IS NULL)
                   OR ABS(x - y) <= 1e-6 * GREATEST(ABS(x), ABS(y)))
    """).fetchall()))
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st,
       totals=st.tuples(st.sampled_from(VALS), st.sampled_from(VALS),
                        st.sampled_from(VALS)))
def test_sum_close_to_total_matches_sql(spark, rows, totals):
    """check_sum_close_to_total vs the SQL twin, with the total
    joined in as a CONSTANT per group (the check's contract — its
    first() pick is only deterministic then): all-NULL part sums
    yield a NULL predicate and pass in both engines."""
    from pudl_spark.validate import check_sum_close_to_total

    tot = dict(zip(["a", "b", "c"], totals))
    pdf = _frame(rows)
    pdf["total"] = pdf["k"].map(tot).astype("Int64")
    sdf = _spark_frame(spark, pdf[["k", "v", "x", "y"]]) \
        .withColumn("total", F.create_map(
            *[F.lit(x) for kv in tot.items() for x in kv]
        )[F.col("k")].cast("long"))
    got = sorted(
        (r["k"], r["sum_parts"], r["total"])
        for r in check_sum_close_to_total(
            sdf, ["k"], "v", "total").collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute("""
        WITH g AS (
            SELECT k, SUM(v) AS sum_parts, MAX(total) AS total
            FROM t GROUP BY k)
        SELECT k, sum_parts, total FROM g
        WHERE NOT (ABS(sum_parts - total)
                   <= 1e-6 * GREATEST(ABS(sum_parts), ABS(total)))
    """).fetchall()))
    assert got == want
