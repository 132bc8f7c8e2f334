"""LATC-TNN tensor completion (M1) — kernel quality, determinism,
simulated-null semantics, and the Spark island."""

from __future__ import annotations

import numpy as np
import pytest

from pudl_spark.functions.impute import (
    fold_series_tensor, latc_tnn, latc_tubal, mape_summary, simulate_nulls,
    unfold_series_tensor,
)


def test_fold_unfold_roundtrip():
    # mirrors the reference doctest (timeseries_cleaning.py:1440-1447)
    x = np.column_stack([[1, 2, 3, 4, 5, 6], [10, 20, 30, 40, 50, 60]])
    tensor = fold_series_tensor(x.astype(float), periods=3)
    assert tensor.shape == (2, 2, 3)
    assert np.array_equal(tensor[0], [[1, 2, 3], [4, 5, 6]])
    assert np.array_equal(unfold_series_tensor(tensor), x)


def test_latc_recovers_low_rank_tensor():
    """The SVD path must beat naive fills by an order of magnitude on
    genuinely low-rank data — this is the check that distinguishes
    LATC from a median/mean fill."""
    rng = np.random.RandomState(0)
    s, g, p = 30, 8, 6
    u = rng.rand(s, 2) + 0.5
    v = rng.rand(2, g * p) + 0.5
    x = (u @ v).reshape(s, g, p)
    mask = rng.rand(s, g, p) < 0.3
    obs = x.copy()
    obs[mask] = 0.0
    out = latc_tnn(obs, maxiter=200)
    mape = np.mean(np.abs((x[mask] - out[mask]) / x[mask]))
    assert mape < 0.05, mape
    mean_fill_mape = np.mean(
        np.abs((x[mask] - obs[obs != 0].mean()) / x[mask]))
    assert mape < mean_fill_mape / 5


def test_latc_deterministic():
    rng = np.random.RandomState(1)
    x = rng.rand(10, 4, 6) + 0.5
    x[rng.rand(10, 4, 6) < 0.25] = 0.0
    a = latc_tnn(x.copy(), maxiter=50)
    b = latc_tnn(x.copy(), maxiter=50)
    assert np.array_equal(a, b)


def test_latc_all_missing_returns_zeros():
    out = latc_tnn(np.zeros((3, 2, 4)))
    assert np.array_equal(out, np.zeros((3, 2, 4)))


def test_simulate_nulls_matches_reference_doctest():
    x = np.column_stack([[1, 2, np.nan, 4, 5, 6, 7, np.nan, np.nan]])
    got = simulate_nulls(x).ravel()
    want = [True, False, False, False, True, True, False, False, False]
    assert got.tolist() == want
    got2 = simulate_nulls(x, lengths=[4], padding=0).ravel()
    want2 = [False, False, False, True, True, True, True, False, False]
    assert got2.tolist() == want2


def test_simulate_nulls_raises_when_no_space():
    x = np.column_stack([[1.0, np.nan, 2.0]])
    with pytest.raises(ValueError, match="no space"):
        simulate_nulls(x, lengths=[3])


def test_mape_summary_drops_zero_actuals():
    actual = np.array([[10.0, 0.0], [20.0, 5.0]])
    imputed = np.array([[11.0, 1.0], [18.0, 4.0]])
    mask = np.array([[True, True], [True, True]])
    out = mape_summary(actual, imputed, mask)
    s0 = out[out.series == 0].iloc[0]
    assert s0["count"] == 2
    assert s0["mape"] == pytest.approx((0.1 + 0.1) / 2)
    s1 = out[out.series == 1].iloc[0]
    # the 0-actual percent error is dropped, only 5->4 remains
    assert s1["mape"] == pytest.approx(0.2)


def test_impute_latc_blocked_island(spark):
    from pyspark.sql import functions as F

    from pudl_spark.functions.impute import impute_latc_blocked

    # two islands of rank-1 series: value = series_scale * cell_level
    rows = []
    for sid, scale in [(0, 1.0), (2, 3.0), (1, 2.0), (3, 5.0)]:
        for grp in range(3):
            for prd in range(4):
                rows.append((sid, grp, prd, scale * (1.0 + grp + prd)))
    df = spark.createDataFrame(
        rows, "series long, grp int, prd int, val double")
    out = {r["island"]: r for r in impute_latc_blocked(
        df, "series", "grp", "prd", "val", n_groups=3, n_periods=4,
        island_expr=F.col("series") % 2, mask_mod=4,
        mape_threshold=0.5, maxiter=100).collect()}
    assert set(out) == {0, 1}
    for isl, r in out.items():
        assert r["n_series"] == 2
        assert r["n_observed"] == 24
        assert r["n_masked"] > 0
        assert r["mape_ok"], (isl, r["mape"])


def test_latc_tubal_recovers_low_rank_tensor():
    """Tubal variant on a genuinely low-rank tensor: near-exact
    recovery, and at least as good as TNN on the same fixture (the
    paper's claim: comparable accuracy, much cheaper per iteration)."""
    rng = np.random.default_rng(3)
    a = rng.random((12, 2))
    b = rng.random((2, 8 * 12))
    tensor = ((a @ b) + 5.0).reshape(12, 8, 12)
    mask = (np.arange(12 * 8 * 12).reshape(12, 8, 12) % 5) == 0
    obs = tensor.copy()
    obs[mask] = 0.0
    comp_tub = latc_tubal(obs.copy(), maxiter=120)
    comp_tnn = latc_tnn(obs.copy(), maxiter=120)
    mape_tub = np.abs((tensor[mask] - comp_tub[mask]) / tensor[mask]).mean()
    mape_tnn = np.abs((tensor[mask] - comp_tnn[mask]) / tensor[mask]).mean()
    assert mape_tub < 0.01
    assert mape_tub <= mape_tnn


def test_latc_tubal_deterministic():
    rng = np.random.default_rng(5)
    tensor = rng.random((6, 4, 12)) + 1.0
    tensor[rng.random((6, 4, 12)) < 0.2] = 0.0
    c1 = latc_tubal(tensor.copy(), maxiter=40)
    c2 = latc_tubal(tensor.copy(), maxiter=40)
    assert np.array_equal(c1, c2)


def test_latc_tubal_zero_guard_prevents_degenerate_convergence():
    """With rho0 tiny, tau = 1/rho exceeds every singular value and
    x_hat is identically zero for many iterations; the solver must
    not declare convergence on the all-zero estimate."""
    rng = np.random.default_rng(7)
    a = rng.random((8, 2))
    b = rng.random((2, 48))
    tensor = ((a @ b) + 5.0).reshape(8, 4, 12)
    mask = (np.arange(8 * 48).reshape(8, 4, 12) % 7) == 0
    obs = tensor.copy()
    obs[mask] = 0.0
    out = latc_tubal(obs.copy(), rho0=1e-4, maxiter=400)
    assert np.any(out)  # did not converge to the zero tensor
