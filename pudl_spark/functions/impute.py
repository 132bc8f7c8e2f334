"""Tensor-completion imputation — the M1 family.

Ref: the reference's timeseries cleaning imputes long hourly series
with Low-rank Autoregressive Tensor Completion
(src/pudl/analysis/timeseries_cleaning.py:555-663 `impute_latc_tnn`,
:1427-1507 `impute`/`fold_tensor`, :1372 `simulate_nulls`, :1511
`summarize_imputed`). The algorithm is published — Chen & Sun (2020),
"Low-Rank Autoregressive Tensor Completion for Multivariate Time
Series Forecasting", arXiv:2006.10436 — and this module implements it
fresh from the paper's ADMM formulation:

    minimize   sum_k alpha_k * ||unfold_k(X)||_{TNN,theta}
               + (lambda/2) * sum_series ||z_m - Q_m a_m||^2
    subject to X == fold(Z), Z agrees with observations

where ||.||_{TNN,theta} is the truncated nuclear norm (the top theta
singular values escape the penalty) and Q_m holds lagged copies of
series m (the autoregressive regularizer). Zeros mark missing values,
like the reference.

Determinism: the reference seeds its AR coefficients with
`rng.random` noise that is overwritten by the first least-squares fit
before any use; this implementation starts them at zero, so the whole
solve is a deterministic function of its inputs — which is what lets
a driver query over it be hash-compared across runs.

Scale shape: one `latc_tnn` call handles one bounded tensor. The
Spark entry point blocks series into islands (hash of the series
key), builds the dense (series x group x period) tensor per island
inside `applyInPandas`, and never materializes anything wider than an
island on one task — the same pattern as the clustering and overlay
islands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


# ----------------------------------------------------------- folding

def fold_series_tensor(x: np.ndarray, periods: int) -> np.ndarray:
    """(observations, series) -> (series, groups, periods), splitting
    each series into consecutive groups of ``periods`` values (ref:
    fold_tensor, timeseries_cleaning.py:1427)."""
    t, s = x.shape
    if t % periods:
        raise ValueError(f"{t} observations not divisible by {periods}")
    return x.T.reshape(s, t // periods, periods)


def unfold_series_tensor(tensor: np.ndarray) -> np.ndarray:
    """Inverse of :func:`fold_series_tensor`: back to
    (observations, series)."""
    s = tensor.shape[0]
    return tensor.reshape(s, -1).T


def _unfold(tensor: np.ndarray, mode: int) -> np.ndarray:
    """Kolda-Bader mode-k unfolding (column-major fiber order)."""
    return np.reshape(np.moveaxis(tensor, mode, 0),
                      (tensor.shape[mode], -1), order="F")


def _fold(mat: np.ndarray, shape, mode: int) -> np.ndarray:
    """Inverse mode-k unfolding."""
    full = [shape[mode]] + [s for i, s in enumerate(shape) if i != mode]
    return np.moveaxis(np.reshape(mat, full, order="F"), 0, mode)


# ------------------------------------------------ truncated-norm SVT

def _svt_truncated(mat: np.ndarray, tau: float, theta: int) -> np.ndarray:
    """Singular-value thresholding for the truncated nuclear norm:
    the largest ``theta`` singular values pass through unshrunk, the
    rest are soft-thresholded by ``tau``. The proximal operator of
    ||.||_{TNN,theta} (Chen & Sun 2020, eq. 7)."""
    u, s, vt = np.linalg.svd(mat, full_matrices=False)
    # theta >= the unfolding's max rank would exempt EVERY singular
    # value and the low-rank prior would vanish; always leave at
    # least one value shrinkable.
    theta = min(theta, len(s) - 1)
    shrunk = s.copy()
    shrunk[theta:] = np.maximum(s[theta:] - tau, 0.0)
    keep = shrunk > 0
    return (u[:, keep] * shrunk[keep]) @ vt[keep, :]


# ------------------------------------------------------------- LATC

def latc_tnn(tensor: np.ndarray,
             lags: tuple[int, ...] = (1,),
             alpha: tuple[float, ...] = (1 / 3, 1 / 3, 1 / 3),
             rho0: float = 1e-5,
             rho_max: float = 1e5,
             lambda0: float = 2e-5,
             theta: int = 3,
             epsilon: float = 1e-6,
             maxiter: int = 200) -> np.ndarray:
    """LATC with truncated nuclear norm, ADMM solve.

    ``tensor`` is (series, groups, periods); NaN or exact 0 marks a
    missing cell (the reference's convention). Returns the completed
    tensor estimate. Deterministic: zero-initialized duals and AR
    coefficients, fixed iteration order, no RNG.
    """
    tensor = np.where(np.isnan(tensor), 0.0, tensor).astype("float64")
    shape = tensor.shape
    n_series = shape[0]
    t_total = int(np.prod(shape[1:]))
    mat = _unfold(tensor, 0)                       # (series, time)
    observed_norm = np.linalg.norm(mat)
    if observed_norm == 0.0:
        return tensor
    missing = mat == 0.0
    max_lag = max(lags)
    lag_cols = np.stack([np.arange(max_lag - lag, t_total - lag)
                         for lag in lags])          # (d, T - max_lag)

    z = mat.copy()
    z[missing] = mat[~missing].mean()
    x_modes = [np.zeros(shape) for _ in range(3)]
    duals = [np.zeros(shape) for _ in range(3)]
    last = mat.copy()
    rho = rho0
    for _ in range(maxiter):
        rho = min(rho * 1.05, rho_max)
        z_ten = _fold(z, shape, 0)
        for k in range(3):
            x_modes[k] = _fold(
                _svt_truncated(_unfold(z_ten - duals[k] / rho, k),
                               alpha[k] / rho, theta),
                shape, k)
        x_hat = sum(a * xk for a, xk in zip(alpha, x_modes))
        mat_hat = _unfold(x_hat, 0)

        blend = _unfold(
            sum(rho * xk + tk for xk, tk in zip(x_modes, duals)) / 3.0, 0)
        if lambda0 > 0:
            pred = np.zeros((n_series, t_total - max_lag))
            for m in range(n_series):
                design = mat_hat[m, lag_cols].T    # (T - max_lag, d)
                coef, *_ = np.linalg.lstsq(design, z[m, max_lag:],
                                           rcond=None)
                pred[m] = design @ coef
            filled = np.concatenate(
                [blend[:, :max_lag] / rho,
                 (blend[:, max_lag:] + lambda0 * pred) / (rho + lambda0)],
                axis=1)
        else:
            filled = blend / rho
        z[missing] = filled[missing]

        z_ten = _fold(z, shape, 0)
        for k in range(3):
            duals[k] += rho * (x_modes[k] - z_ten)

        tol = np.linalg.norm(mat_hat - last) / observed_norm
        last = mat_hat
        # While tau = 1/rho still exceeds every singular value, x_hat
        # is identically zero and tol degenerates to 0 at iteration 2;
        # a convergence break there would return the zero tensor.
        # Only accept convergence once the SVT passes something.
        if tol < epsilon and np.any(x_hat):
            break
    return x_hat


# ------------------------------------------------------- LATC-Tubal

def _tsvt(tensor: np.ndarray, phi: np.ndarray, tau: float) -> np.ndarray:
    """Tubal singular-value thresholding: rotate the mode-3 fibers
    into the transform domain spanned by the columns of ``phi``
    (orthonormal), soft-threshold each frontal slice's singular
    values by ``tau``, rotate back (Chen, Chen & Sun 2020,
    arXiv:2008.03194, alg. 2 — the unitary-transform generalisation
    of FFT-domain tubal SVT)."""
    xt = np.tensordot(tensor, phi, axes=([2], [0]))
    out = np.zeros_like(xt)
    for t in range(xt.shape[2]):
        u, s, vt = np.linalg.svd(xt[:, :, t], full_matrices=False)
        keep = s > tau
        if keep.any():
            out[:, :, t] = (u[:, keep] * (s[keep] - tau)) @ vt[keep, :]
    return np.tensordot(out, phi, axes=([2], [1]))


def _mode3_transform(tensor: np.ndarray) -> np.ndarray:
    """Data-driven orthonormal transform for the tubal product: the
    eigenbasis of the mode-3 unfolding's Gram matrix, eigenvalues
    descending. ``eigh`` (symmetric) keeps it real and deterministic
    where generic ``eig`` would return an arbitrary order."""
    m3 = _unfold(tensor, 2)
    evals, evecs = np.linalg.eigh(m3 @ m3.T)
    return evecs[:, ::-1]


def latc_tubal(tensor: np.ndarray,
               lags: tuple[int, ...] = (1,),
               rho0: float = 1e-1,
               rho_max: float = 1e5,
               lambda0: float = 2e-5,
               epsilon: float = 1e-6,
               maxiter: int = 200,
               phi_refresh: int = 10) -> np.ndarray:
    """LATC with low-TUBAL-rank prior (ref: impute_latc_tubal + _tsvt,
    src/pudl/analysis/timeseries_cleaning.py:650-748 — the reference's
    production default for large tensors; published as Chen, Chen &
    Sun 2020, arXiv:2008.03194). Fresh implementation from the paper.

    Where :func:`latc_tnn` penalises three mode unfoldings with the
    truncated nuclear norm, the tubal variant runs ONE tensor-SVT per
    iteration in a transform domain along the period mode — O(periods)
    small SVDs of (series x groups) slices instead of three SVDs of
    full unfoldings, which is what makes it the fast path at scale.
    The autoregressive regularizer is identical to the TNN variant.

    Deterministic departures from the reference (same algorithm, no
    RNG): zero-initialised duals and AR coefficients (the reference's
    random inits are overwritten before first use), ``eigh``-based
    transform with a fixed descending eigenvalue order, ``lstsq``
    instead of explicit pinv, and no random row-sampling shortcut for
    the AR fit (the reference samples above 5000 time steps purely
    for speed). ``rho0`` defaults two decades higher than the TNN
    variant's: tubal SVT has no theta exemption, so the initial
    threshold 1/rho0 must sit below the data's leading singular
    values or early iterations zero the estimate entirely.
    """
    tensor = np.where(np.isnan(tensor), 0.0, tensor).astype("float64")
    shape = tensor.shape
    n_series = shape[0]
    t_total = int(np.prod(shape[1:]))
    mat = _unfold(tensor, 0)                       # (series, time)
    observed_norm = np.linalg.norm(mat)
    if observed_norm == 0.0:
        return tensor
    missing = mat == 0.0
    max_lag = max(lags)
    lag_cols = np.stack([np.arange(max_lag - lag, t_total - lag)
                         for lag in lags])          # (d, T - max_lag)

    z = mat.copy()
    z[missing] = mat[~missing].mean()
    dual = np.zeros(shape)
    last = mat.copy()
    rho = rho0
    phi = _mode3_transform(_fold(z, shape, 0))
    x_hat = np.zeros(shape)
    for it in range(1, maxiter + 1):
        rho = min(rho * 1.05, rho_max)
        z_ten = _fold(z, shape, 0)
        x_hat = _tsvt(z_ten - dual / rho, phi, 1.0 / rho)
        mat_hat = _unfold(x_hat, 0)

        blend = _unfold(rho * x_hat + dual, 0)
        if lambda0 > 0:
            pred = np.zeros((n_series, t_total - max_lag))
            for m in range(n_series):
                design = mat_hat[m, lag_cols].T    # (T - max_lag, d)
                coef, *_ = np.linalg.lstsq(design, z[m, max_lag:],
                                           rcond=None)
                pred[m] = design @ coef
            filled = np.concatenate(
                [blend[:, :max_lag] / rho,
                 (blend[:, max_lag:] + lambda0 * pred) / (rho + lambda0)],
                axis=1)
        else:
            filled = blend / rho
        z[missing] = filled[missing]

        z_ten = _fold(z, shape, 0)
        dual += rho * (x_hat - z_ten)
        if phi_refresh and it % phi_refresh == 0:
            phi = _mode3_transform(z_ten - dual / rho)

        tol = np.linalg.norm(mat_hat - last) / observed_norm
        last = mat_hat
        # While tau = 1/rho still exceeds every singular value, x_hat
        # is identically zero and tol degenerates to 0 at iteration 2;
        # a convergence break there would return the zero tensor.
        # Only accept convergence once the SVT passes something.
        if tol < epsilon and np.any(x_hat):
            break
    return x_hat


# --------------------------------------------------- simulated nulls

def _null_run_lengths(is_null: np.ndarray) -> list[int]:
    """Lengths of consecutive-True runs, in order of appearance."""
    runs, count = [], 0
    for v in is_null:
        if v:
            count += 1
        elif count:
            runs.append(count)
            count = 0
    if count:
        runs.append(count)
    return runs


def simulate_nulls(x: np.ndarray, lengths=None,
                   padding: int = 1) -> np.ndarray:
    """Mask non-null values to mirror each series' existing null
    run-length distribution (ref: simulate_nulls,
    timeseries_cleaning.py:1372-1424). First-fit placement scanning
    left to right, keeping ``padding`` untouched values between a
    simulated run and any other (real or simulated) null run — the
    reference's doctest semantics, fully deterministic.

    ``x`` is (observations, series); returns a boolean mask of the
    same shape marking values to null out.
    """
    t, s = x.shape
    mask = np.zeros((t, s), dtype=bool)
    for col in range(s):
        is_null = np.isnan(x[:, col])
        runs = (_null_run_lengths(is_null) if lengths is None
                else list(lengths))
        blocked = is_null.copy()
        for run in runs:
            placed = False
            for start in range(t - run + 1):
                lo = max(0, start - padding)
                hi = min(t, start + run + padding)
                if not blocked[lo:hi].any():
                    mask[start:start + run, col] = True
                    blocked[start:start + run] = True
                    placed = True
                    break
            if not placed:
                raise ValueError(
                    f"no space for simulated null run of length {run}")
    return mask


def mape_summary(actual: np.ndarray, imputed: np.ndarray,
                 mask: np.ndarray) -> pd.DataFrame:
    """Per-series MPE / MAPE over masked cells (ref:
    summarize_imputed, timeseries_cleaning.py:1511-1551). NaN percent
    errors (actual == 0) are dropped like the reference."""
    stats = []
    for col in range(actual.shape[1]):
        vals = actual[mask[:, col], col]
        if not vals.size:
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            pe = (vals - imputed[mask[:, col], col]) / vals
        pe = pe[np.isfinite(pe)]
        stats.append({"series": col, "count": int(vals.size),
                      "mpe": float(np.mean(pe)) if pe.size else np.nan,
                      "mape": float(np.mean(np.abs(pe)))
                      if pe.size else np.nan})
    return pd.DataFrame(stats)


# ------------------------------------------------------ Spark island

def impute_latc_blocked(df: DataFrame, series_col: str, group_col: str,
                        period_col: str, value_col: str,
                        n_groups: int, n_periods: int,
                        n_islands: int = 8,
                        island_expr=None,
                        mask_mod: int | None = None,
                        mape_threshold: float = 0.75,
                        method: str = "tnn",
                        **latc_kwargs) -> DataFrame:
    """Blocked LATC imputation + MAPE scoring as one applyInPandas
    pass. Series are hashed into ``n_islands`` islands; each island
    builds its dense (series x n_groups x n_periods) tensor, masks
    observed cells where ``hash % mask_mod == 0`` (simulated nulls),
    runs :func:`latc_tnn`, and scores the masked cells. Returns one
    row per island: (island, n_series, n_observed, n_masked, mape_ok).

    The relational columns are exact (and SQL-oracle-checkable); the
    boolean certifies the SVD kernel imputed within
    ``mape_threshold`` — a degenerate kernel (zeros, garbage) fails
    it, so the flag is a real functional check, not a tautology.

    ``island_expr`` overrides the default hash-based island
    assignment with a caller-supplied Column (e.g. a modulo of the
    series key when the blocking itself must be reproducible in an
    external oracle engine).
    """
    from pudl_spark.catalog import spread_small_input

    if island_expr is None:
        island_expr = F.pmod(F.hash(F.col(series_col)), F.lit(n_islands))
    base = df.select(
        F.col(series_col).alias("series"),
        F.col(group_col).cast("int").alias("grp"),
        F.col(period_col).cast("int").alias("prd"),
        F.col(value_col).cast("double").alias("val"),
        island_expr.cast("int").alias("island"),
    )

    schema = ("island int, n_series long, n_observed long, "
              "n_masked long, mape double, mape_ok boolean")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        series_ids = np.sort(pdf["series"].unique())
        idx = {sid: i for i, sid in enumerate(series_ids)}
        n_s = len(series_ids)
        tensor = np.zeros((n_s, n_groups, n_periods))
        for sid, grp, prd, val in zip(pdf["series"], pdf["grp"],
                                      pdf["prd"], pdf["val"]):
            tensor[idx[sid], int(grp), int(prd)] = val
        observed = tensor != 0.0
        if mask_mod:
            s_idx, g_idx, p_idx = np.nonzero(observed)
            sids = series_ids[s_idx]
            cell = (sids * 31 + g_idx * n_periods + p_idx)
            sim = cell % mask_mod == 0
            mask = np.zeros_like(observed)
            mask[s_idx[sim], g_idx[sim], p_idx[sim]] = True
        else:
            mask = np.zeros_like(observed)
        actual = tensor.copy()
        tensor[mask] = 0.0
        solver = latc_tubal if method == "tubal" else latc_tnn
        completed = solver(tensor, **latc_kwargs)
        vals = actual[mask]
        with np.errstate(divide="ignore", invalid="ignore"):
            pe = np.abs((vals - completed[mask]) / vals)
        pe = pe[np.isfinite(pe)]
        mape = float(np.mean(pe)) if pe.size else float("nan")
        return pd.DataFrame({
            "island": [int(pdf["island"].iloc[0])],
            "n_series": [n_s],
            "n_observed": [int(observed.sum())],
            "n_masked": [int(mask.sum())],
            "mape": [round(mape, 6)],
            "mape_ok": [bool(mape < mape_threshold)],
        })

    spread = spread_small_input(base, "island")
    return spread.groupBy("island").applyInPandas(kernel, schema)
