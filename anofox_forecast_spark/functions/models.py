"""Forecast model library: pure-numpy implementations of the 33 model types.

Parity target: the reference's model enum and semantics
(``crates/anofox-fcst-core/src/forecast.rs:93-306``; model table in
``docs/api/07-forecasting.md:130-230``). The reference delegates model math to
the external ``anofox-forecast`` crates.io crate whose algorithms mirror
Nixtla ``statsforecast``; we re-implement the published algorithms directly in
numpy (statsforecast is not available in this environment).

Everything here is deterministic: optimizations use golden-section / fixed
grid + Nelder-Mead with fixed starting simplexes; no RNG anywhere except
bootstrap (seeded).

Conventions shared with the pure-SQL fast path in
``anofox_forecast_spark.operators.forecast`` (and with the DuckDB oracle SQL):

- NULL policy: interior NaNs linearly interpolated by position, edge NaNs
  filled with nearest valid value (ref ``imputation.rs:62`` via
  ``forecast.rs:514``); series with < 3 valid points raise ``ValueError``
  (ref ``forecast.rs:520-523``).
- Intervals at confidence level ``cl``: ``point ± z * sigma_h`` with
  ``z = norm_ppf(0.5 + cl/2)``; per-model ``sigma_h`` documented on each
  function.
"""

from __future__ import annotations

import ctypes
import math
from dataclasses import dataclass, field

import numpy as np

from . import cfilters as _cfilters

# ---------------------------------------------------------------------------
# Small numeric utilities (scipy-free)
# ---------------------------------------------------------------------------

_DPTR = ctypes.POINTER(ctypes.c_double)


def _cf():
    """The compiled optimizer-loop library, or None (pure-Python fallback).

    The C twins reproduce the Python recursions' IEEE arithmetic exactly
    (see ``_cfilters.c``); every integration below keeps the Python
    closure as the no-gcc fallback, so behaviour is identical either way
    — only the per-Nelder-Mead-step interpreter cost changes."""
    return _cfilters.get_lib()


def _dp(a: np.ndarray):
    return a.ctypes.data_as(_DPTR)

def norm_ppf(p: float) -> float:
    """Inverse normal CDF (Acklam's rational approximation, ~1e-9 accurate)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def _seq_sum(a):
    """Sequential left-to-right sum — the order DuckDB's list folds and
    ``list_aggregate(.., 'sum')`` use.  The paired SQL oracles replay
    optimizer decision sequences bit-for-bit, and ``np.nansum``'s pairwise
    summation differs in the last ulp, which can flip a near-tie
    reflect/expand/contract comparison; sharing the summation order keeps
    both sides on the same branch everywhere."""
    a = np.asarray(a, dtype=float)
    if a.size == 0:
        return 0.0
    return float(np.cumsum(a)[-1])


def _sq_err(r):
    """Sequential sum of squared errors with NaNs skipped (``np.nansum``
    semantics, fold order — see :func:`_seq_sum`)."""
    r = np.asarray(r, dtype=float)
    return _seq_sum(np.where(np.isnan(r), 0.0, r * r))


def _linfit(x):
    """OLS line over t = 0..n-1 via the explicit-sums formula, expression-
    identical to the SQL oracles.  ``np.polyfit``'s scaled-SVD path agrees
    only to ~1e-12, enough to flip optimizer tie-breaks downstream."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 2:
        return 0.0, (float(x[0]) if n else 0.0)
    t = np.arange(n, dtype=float)
    st = float(n * (n - 1) // 2)
    st2 = float((n - 1) * n * (2 * n - 1) // 6)
    sv = _seq_sum(x)
    stv = _seq_sum(t * x)
    den = float(n) * st2 - st * st
    b1 = (float(n) * stv - st * sv) / den
    b0 = (sv - b1 * st) / float(n)
    return b1, b0


def golden_section(f, lo: float, hi: float, tol: float = 1e-5, max_iter: int = 100) -> float:
    """Deterministic scalar minimizer on [lo, hi]."""
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(max_iter):
        if abs(b - a) < tol:
            break
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = f(d)
    return (a + b) / 2.0


def nelder_mead(f, x0, bounds=None, tol: float = 1e-6, max_iter: int = 200):
    """Tiny deterministic Nelder–Mead with box-bound clipping.

    Pure-Python list arithmetic (r13): every candidate point is built from
    the same elementwise IEEE operations in the same order as the previous
    numpy-array form, so the search trajectory is bit-identical — np.clip
    is elementwise min/max, the stable argsort matches Python's stable
    sort for the finite objective values the callers guarantee (every
    objective guards non-finite results to +-1e300), and the centroid's
    np.mean is a sequential left-to-right sum for fewer than 8 addends
    (numpy's pairwise summation only blocks at n >= 8; all in-repo
    problems are 1-5 dimensional, and the >= 8-point case falls back to
    np.mean itself). Dropping the per-iteration numpy boxing cut the
    optimizer-loop overhead ~2x on the AutoETS profile."""
    xs = [float(v) for v in x0]
    n = len(xs)
    if bounds is None:
        def clip(x):
            return x
    else:
        los = [float(b[0]) for b in bounds]
        his = [float(b[1]) for b in bounds]

        def clip(x):
            # np.clip == minimum(maximum(x, lo), hi) elementwise; the
            # simplex stays finite (bounded after clip), so the NaN
            # branch of np.minimum/maximum is unreachable
            return [l if v < l else (h if v > h else v)
                    for v, l, h in zip(x, los, his)]

    simplex = [clip(xs)]
    for i in range(n):
        xi = list(xs)
        xi[i] = xi[i] + (0.1 if xi[i] == 0 else 0.1 * abs(xi[i]) + 0.05)
        simplex.append(clip(xi))
    fvals = [f(x) for x in simplex]
    npts = len(simplex) - 1  # centroid addend count
    for _ in range(max_iter):
        order = sorted(range(len(fvals)), key=fvals.__getitem__)
        simplex = [simplex[i] for i in order]
        fvals = [fvals[i] for i in order]
        if abs(fvals[-1] - fvals[0]) < tol:
            break
        if npts <= 7:
            centroid = []
            for j in range(n):
                s = simplex[0][j]
                for p in simplex[1:-1]:
                    s += p[j]
                centroid.append(s / npts)
        else:  # preserve numpy's pairwise-summation bits beyond 7 addends
            centroid = [float(v)
                        for v in np.mean(np.asarray(simplex[:-1]), axis=0)]
        worst = simplex[-1]
        xr = clip([c + (c - w) for c, w in zip(centroid, worst)])
        fr = f(xr)
        if fr < fvals[0]:
            xe = clip([c + 2.0 * (c - w) for c, w in zip(centroid, worst)])
            fe = f(xe)
            if fe < fr:
                simplex[-1], fvals[-1] = xe, fe
            else:
                simplex[-1], fvals[-1] = xr, fr
        elif fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        else:
            xc = clip([c + 0.5 * (w - c) for c, w in zip(centroid, worst)])
            fc = f(xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:
                best = simplex[0]
                simplex = [best] + [
                    clip([bv + 0.5 * (sv - bv) for bv, sv in zip(best, s)])
                    for s in simplex[1:]]
                fvals = [fvals[0]] + [f(s) for s in simplex[1:]]
    best_i = 0
    for j in range(1, len(fvals)):
        if fvals[j] < fvals[best_i]:
            best_i = j
    return simplex[best_i]


# ---------------------------------------------------------------------------
# Canonical model names + alias parsing (ref forecast.rs:148-259)
# ---------------------------------------------------------------------------

CANONICAL_MODELS = [
    "AutoETS", "AutoARIMA", "AutoTheta", "AutoMFLES", "AutoMSTL", "AutoTBATS",
    "Naive", "SMA", "SeasonalNaive", "SES", "SESOptimized", "RandomWalkDrift",
    "Holt", "HoltWinters", "SeasonalES", "SeasonalESOptimized", "SeasonalWindowAverage",
    "Theta", "OptimizedTheta", "DynamicTheta", "DynamicOptimizedTheta",
    "ETS", "ARIMA", "MFLES", "MSTL", "TBATS",
    "CrostonClassic", "CrostonOptimized", "CrostonSBA", "ADIDA", "IMAPA", "TSB",
    "Laplace",
]

_ALIASES = {
    "autoets": "AutoETS", "auto_ets": "AutoETS", "auto": "AutoETS",
    "autoarima": "AutoARIMA", "auto_arima": "AutoARIMA",
    "autotheta": "AutoTheta", "auto_theta": "AutoTheta",
    "automfles": "AutoMFLES", "auto_mfles": "AutoMFLES",
    "automstl": "AutoMSTL", "auto_mstl": "AutoMSTL",
    "autotbats": "AutoTBATS", "auto_tbats": "AutoTBATS",
    "naive": "Naive",
    "sma": "SMA",
    "seasonalnaive": "SeasonalNaive", "seasonal_naive": "SeasonalNaive", "snaive": "SeasonalNaive",
    "ses": "SES",
    "sesoptimized": "SESOptimized", "ses_optimized": "SESOptimized",
    "randomwalkdrift": "RandomWalkDrift", "random_walk_drift": "RandomWalkDrift",
    "rwd": "RandomWalkDrift", "drift": "RandomWalkDrift",
    "randomwalkwithdrift": "RandomWalkDrift", "random_walk_with_drift": "RandomWalkDrift",
    "holt": "Holt",
    "holtwinters": "HoltWinters", "holt_winters": "HoltWinters", "hw": "HoltWinters",
    "seasonales": "SeasonalES", "seasonal_es": "SeasonalES",
    "seasonalesoptimized": "SeasonalESOptimized", "seasonal_es_optimized": "SeasonalESOptimized",
    "seasonalwindowaverage": "SeasonalWindowAverage",
    "seasonal_window_average": "SeasonalWindowAverage", "swa": "SeasonalWindowAverage",
    "theta": "Theta",
    "optimizedtheta": "OptimizedTheta", "optimized_theta": "OptimizedTheta", "otm": "OptimizedTheta",
    "dynamictheta": "DynamicTheta", "dynamic_theta": "DynamicTheta", "dstm": "DynamicTheta",
    "dynamicoptimizedtheta": "DynamicOptimizedTheta",
    "dynamic_optimized_theta": "DynamicOptimizedTheta",
    "ets": "ETS",
    "arima": "ARIMA",
    "mfles": "MFLES", "mstl": "MSTL", "tbats": "TBATS",
    "crostonclassic": "CrostonClassic", "croston_classic": "CrostonClassic",
    "croston": "CrostonClassic",
    "crostonoptimized": "CrostonOptimized", "croston_optimized": "CrostonOptimized",
    "crostonsba": "CrostonSBA", "croston_sba": "CrostonSBA", "sba": "CrostonSBA",
    "adida": "ADIDA", "imapa": "IMAPA", "tsb": "TSB",
    "laplace": "Laplace",
}


def canonical_model(name: str) -> str:
    if name in CANONICAL_MODELS:
        return name
    key = name.strip().lower()
    if key in _ALIASES:
        return _ALIASES[key]
    raise ValueError(f"Unknown model: {name}")


# Models whose point forecast + intervals are pure Spark SQL (no Python).
# Membership rule (r10): every smoothing/shape constant is CLOSED (no
# optimizer), so the recursion runs as a Catalyst aggregate() fold over
# the ds-sorted series — window-template models (Naive family) and the
# fold models (SES/Croston/TSB/SeasonalES) qualify; anything with a
# golden-section or Nelder-Mead search stays on the pandas-UDF path.
# Fixed-parameter Holt also rides the fold path, gated in ts_forecast_by
# on both constants being provided rather than by this set.
SQL_PATH_MODELS = {"Naive", "SeasonalNaive", "SMA", "SeasonalWindowAverage",
                   "RandomWalkDrift", "SES", "CrostonClassic", "CrostonSBA",
                   "TSB", "SeasonalES"}

SEASONAL_MODELS = {"SeasonalNaive", "SeasonalWindowAverage", "HoltWinters",
                   "SeasonalES", "SeasonalESOptimized", "MSTL", "AutoMSTL",
                   "MFLES", "AutoMFLES", "TBATS", "AutoTBATS"}


# ---------------------------------------------------------------------------
# Preprocessing (ref forecast.rs:512-523, imputation.rs:62)
# ---------------------------------------------------------------------------

def interpolate_nulls(y: np.ndarray) -> np.ndarray:
    """Linear position-based interpolation of NaNs; edges take nearest valid."""
    y = np.asarray(y, dtype=float).copy()
    mask = np.isnan(y)
    if not mask.any():
        return y
    valid = ~mask
    if valid.sum() == 0:
        return y
    idx = np.arange(len(y))
    y[mask] = np.interp(idx[mask], idx[valid], y[valid])
    return y


def validate_series(y: np.ndarray) -> np.ndarray:
    y = interpolate_nulls(y)
    if np.isfinite(y).sum() < 3:
        raise ValueError("series must have at least 3 valid points")
    return y


def detect_seasonality(y: np.ndarray, max_period: int | None = None) -> int:
    """Periodogram-based dominant period (ref seasonality.rs:323-380).

    Returns 1 when no significant period is found.
    """
    y = interpolate_nulls(np.asarray(y, dtype=float))
    n = len(y)
    if n < 8:
        return 1
    x = y - _seq_sum(y) / n
    # detrend linearly to avoid the trend dominating low frequencies
    # (explicit-sums fit + sequential mean, mirrored by the auto-model
    # oracles' detection replay)
    t = np.arange(n, dtype=float)
    b1, b0 = _linfit(x)
    x = x - (b1 * t + b0)
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n)
    spec[0] = 0.0
    if max_period is None:
        max_period = n // 2
    best, best_power = 1, 0.0
    total = spec.sum()
    if total <= 0:
        return 1
    for i in range(1, len(spec)):
        if freqs[i] <= 0:
            continue
        period = 1.0 / freqs[i]
        if period < 2 or period > max_period:
            continue
        if spec[i] > best_power:
            best_power = spec[i]
            best = int(round(period))
    # significance: dominant peak must carry a non-trivial share of variance
    if best_power / total < 0.1:
        return 1
    return max(best, 1)


# ---------------------------------------------------------------------------
# Result container
# ---------------------------------------------------------------------------

@dataclass
class ForecastResult:
    point: np.ndarray
    lower: np.ndarray
    upper: np.ndarray
    model_name: str
    fitted: np.ndarray | None = None
    residuals: np.ndarray | None = None
    params: dict = field(default_factory=dict)
    aic: float = float("nan")
    bic: float = float("nan")


def _sigma(res: np.ndarray) -> float:
    res = res[np.isfinite(res)]
    if len(res) < 2:
        return 0.0
    return float(np.std(res, ddof=1))


def _interval(point: np.ndarray, width: np.ndarray, cl: float):
    z = norm_ppf(0.5 + cl / 2.0)
    return point - z * width, point + z * width


def _aic_bic(sse: float, n: int, k: int):
    if n <= 0 or sse <= 0:
        return float("nan"), float("nan")
    aic = n * math.log(sse / n) + 2 * k
    bic = n * math.log(sse / n) + k * math.log(n)
    return aic, bic


# ---------------------------------------------------------------------------
# Basic models — interval conventions shared with the SQL fast path
# ---------------------------------------------------------------------------

def _naive(y, h, cl, **kw):
    steps = np.arange(1, h + 1, dtype=float)
    point = np.full(h, y[-1])
    fitted = np.concatenate([[np.nan], y[:-1]])
    sig = _sigma(np.diff(y))
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    return ForecastResult(point, lo, up, "Naive", fitted, y - fitted)


def _random_walk_drift(y, h, cl, **kw):
    n = len(y)
    drift = (y[-1] - y[0]) / (n - 1) if n > 1 else 0.0
    steps = np.arange(1, h + 1, dtype=float)
    point = y[-1] + drift * steps
    fitted = np.concatenate([[np.nan], y[:-1] + drift])
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    return ForecastResult(point, lo, up, "RandomWalkDrift", fitted, res,
                          params={"drift": drift})


def _sma(y, h, cl, window=5, **kw):
    w = int(window)
    w = max(1, min(w, len(y)))
    point = np.full(h, float(np.mean(y[-w:])))
    fitted = np.full(len(y), np.nan)
    c = np.concatenate([[0.0], np.cumsum(y)])
    for t in range(w, len(y)):
        fitted[t] = (c[t] - c[t - w]) / w
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, np.full(h, sig), cl)
    return ForecastResult(point, lo, up, "SMA", fitted, res, params={"window": w})


def _seasonal_naive(y, h, cl, season_length=1, **kw):
    m = max(int(season_length), 1)
    n = len(y)
    if n < m:
        m = max(n, 1)
    steps = np.arange(1, h + 1)
    idx = n - m + ((steps - 1) % m)
    point = y[idx]
    fitted = np.full(n, np.nan)
    if n > m:
        fitted[m:] = y[:-m]
    res = y - fitted
    sig = _sigma(res)
    width = sig * np.sqrt(((steps - 1) // m + 1).astype(float))
    lo, up = _interval(point, width, cl)
    return ForecastResult(point, lo, up, "SeasonalNaive", fitted, res,
                          params={"seasonal_period": m})


def _seasonal_window_average(y, h, cl, season_length=1, window=2, **kw):
    m = max(int(season_length), 1)
    w = max(int(window), 1)
    n = len(y)
    phase_means = np.full(m, np.nan)
    for ph in range(m):
        # positions with this phase relative to the series end
        pos = np.arange(n - 1 - ph, -1, -m)[:w]
        if len(pos):
            phase_means[ph] = float(np.mean(y[pos]))
    steps = np.arange(1, h + 1)
    # step s continues the cycle: phase (counting back from end) is m-1-((s-1)%m)
    point = phase_means[(m - 1 - ((steps - 1) % m)) % m][...]
    fitted = np.full(n, np.nan)
    if n > m:
        fitted[m:] = y[:-m]
    res = y - fitted
    sig = _sigma(res)
    width = sig * np.sqrt(((steps - 1) // m + 1).astype(float))
    lo, up = _interval(point, width, cl)
    return ForecastResult(point, lo, up, "SeasonalWindowAverage", fitted, res,
                          params={"seasonal_period": m, "window": w})


def _ses_filter(y, alpha, l0=None):
    # hot loop (one call per golden-section step in SESOptimized and
    # inside every Theta variant): C twin when available, else the
    # list-local Python loop — same left-assoc arithmetic either way
    lib = _cf()
    if lib is not None and len(y) > 0:
        ya = np.ascontiguousarray(y, dtype=float)
        n = len(ya)
        fitted = np.empty(n, dtype=float)
        final = lib.ses_filter(
            _dp(ya), n, float(alpha),
            float(ya[0]) if l0 is None else l0, _dp(fitted))
        return fitted, final
    yl = y.tolist() if isinstance(y, np.ndarray) else list(y)
    n = len(yl)
    fitted = [0.0] * n
    level = yl[0] if l0 is None else l0
    fitted[0] = level
    one_a = 1 - alpha
    for t in range(1, n):
        level = alpha * yl[t - 1] + one_a * level
        fitted[t] = level
    final = alpha * yl[-1] + one_a * level
    return np.asarray(fitted, dtype=float), final


def _ses(y, h, cl, alpha=0.3, _name="SES", **kw):
    a = float(alpha)
    fitted, level = _ses_filter(y, a)
    point = np.full(h, level)
    res = y - fitted
    sig = _sigma(res)
    steps = np.arange(1, h + 1, dtype=float)
    width = sig * np.sqrt(1.0 + (steps - 1) * a * a)
    lo, up = _interval(point, width, cl)
    sse = _sq_err(res)
    aic, bic = _aic_bic(sse, len(y), 1)
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"alpha": a}, aic=aic, bic=bic)


def _ses_sse(yl, alpha):
    """SSE of the SES one-step fit, accumulated INSIDE the recursion —
    bit-identical to ``_sq_err(y - _ses_filter(y, a)[0])``: the residual
    sequence, the squaring, and the left-to-right summation order are
    the same (a square is never -0.0, and adding 0.0 for a NaN residual
    matches the where-skip), only the array materialization is gone.
    One call per golden-section step — the SESOptimized hot path."""
    n = len(yl)
    level = yl[0]
    r0 = yl[0] - level
    s = r0 * r0 if r0 == r0 else 0.0
    one_a = 1 - alpha
    for t in range(1, n):
        level = alpha * yl[t - 1] + one_a * level
        x = yl[t] - level
        if x == x:
            s += x * x
    return s


def _ses_optimized(y, h, cl, **kw):
    lib = _cf()
    if lib is not None and len(y) > 0:
        # whole golden-section search in C (r13 second pass): same
        # bracketing arithmetic, same ses_sse objective — bit-identical
        # trajectory, zero per-step ctypes crossings
        ya = np.ascontiguousarray(y, dtype=float)
        a = lib.golden_ses(_dp(ya), len(ya))
    else:
        yl = y.tolist() if isinstance(y, np.ndarray) else list(y)

        def sse(a_):
            return _ses_sse(yl, a_)
        a = golden_section(sse, 0.01, 0.99)
    out = _ses(y, h, cl, alpha=a, _name="SESOptimized")
    return out


def _holt(y, h, cl, alpha=None, beta=None, damped=False, phi=0.98, _name="Holt", **kw):
    """Holt's linear method; optimizes (alpha, beta) by SSE when not given."""
    # the serial recursions are the AutoETS/optimizer hot loops (one
    # evaluation per Nelder-Mead step); plain-Python locals instead of
    # numpy scalar indexing cut the interpreter overhead ~2-3x with
    # bit-identical IEEE arithmetic (tolist() round-trips doubles
    # exactly; hoisted constants preserve the original left-assoc
    # groupings, e.g. ((1-b)*ph)*trend)
    yl = np.asarray(y, dtype=float).tolist()

    def filt(a, b, ph):
        n = len(yl)
        lib2 = _cf()
        if lib2 is not None and n > 0:
            # C twin of the loop below (same recursion as holt_sse,
            # trajectories stored)
            ya2 = np.ascontiguousarray(y, dtype=float)
            fbuf = np.empty(n, dtype=float)
            st = np.empty(2, dtype=float)
            lib2.holt_filt(_dp(ya2), n, a, b, ph, _dp(fbuf), _dp(st))
            return fbuf, float(st[0]), float(st[1])
        level, trend = yl[0], (yl[1] - yl[0]) if n > 1 else 0.0
        fitted = [0.0] * n
        fitted[0] = level
        one_a = 1 - a
        one_b_ph = (1 - b) * ph
        for t in range(1, n):
            f = level + ph * trend
            fitted[t] = f
            newl = a * yl[t] + one_a * f
            trend = b * (newl - level) * ph + one_b_ph * trend
            level = newl
        return np.asarray(fitted, dtype=float), level, trend

    def filt_sse(a, b, ph):
        # SSE accumulated inside the recursion — see _ses_sse for the
        # bit-identity argument; same per-step expressions as filt
        n = len(yl)
        level, trend = yl[0], (yl[1] - yl[0]) if n > 1 else 0.0
        r0 = yl[0] - level
        s = r0 * r0 if r0 == r0 else 0.0
        one_a = 1 - a
        one_b_ph = (1 - b) * ph
        for t in range(1, n):
            f = level + ph * trend
            x = yl[t] - f
            if x == x:
                s += x * x
            newl = a * yl[t] + one_a * f
            trend = b * (newl - level) * ph + one_b_ph * trend
            level = newl
        return s

    ph = float(phi) if damped else 1.0
    if alpha is None or beta is None:
        lib = _cf()
        if lib is not None and len(yl) > 0:
            # whole Nelder-Mead in C (r13 second pass): the C nm_run
            # twins models.nelder_mead step for step (CPython-sort
            # replica included), objective = holt_sse — bit-identical
            # search trajectory, zero per-step ctypes crossings
            ya = np.ascontiguousarray(y, dtype=float)
            out = np.empty(2, dtype=float)
            lib.nm_holt(_dp(ya), len(ya), ph, _dp(out))
            a, b = float(out[0]), float(out[1])
        else:
            def sse(x):
                return filt_sse(x[0], x[1], ph)
            a, b = nelder_mead(sse, [0.5, 0.1],
                               bounds=[(0.01, 0.99), (0.01, 0.99)])
    else:
        a, b = float(alpha), float(beta)
    fitted, level, trend = filt(a, b, ph)
    steps = np.arange(1, h + 1, dtype=float)
    if damped:
        damp = np.cumsum(ph ** steps)
        point = level + damp * trend
    else:
        point = level + steps * trend
    res = y - fitted
    sig = _sigma(res)
    width = sig * np.sqrt(steps)
    lo, up = _interval(point, width, cl)
    sse_v = _sq_err(res)
    aic, bic = _aic_bic(sse_v, len(y), 2 + (1 if damped else 0))
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"alpha": a, "beta": b, "phi": ph}, aic=aic, bic=bic)


def _holt_winters(y, h, cl, season_length=1, alpha=None, beta=None, gamma=None,
                  multiplicative=False, _name="HoltWinters", **kw):
    """Additive (or multiplicative) Holt-Winters; optimizes free params by SSE."""
    m = max(int(season_length), 1)
    n = len(y)
    if m < 2 or n < 2 * m:
        return _holt(y, h, cl, alpha=alpha, beta=beta, _name=_name)

    # plain-Python hot loop (see _holt.filt): bit-identical arithmetic,
    # ~2-3x less interpreter overhead per Nelder-Mead evaluation. The
    # additive/multiplicative branch is hoisted into two specialized
    # loops with the SAME per-step expressions.
    yl = np.asarray(y, dtype=float).tolist()
    # the initial states do not depend on (a, b, g): computed ONCE per
    # series instead of once per Nelder-Mead evaluation (r13 — same
    # np.mean values, cached; ~3 np.mean calls and the seasonal warm-up
    # list removed from every optimizer step, bit-identical). float()
    # unboxes the np.float64 trend so the loop runs on Python floats —
    # same IEEE doubles either way.
    level0 = float(np.mean(y[:m]))
    trend0 = float((np.mean(y[m:2 * m]) - np.mean(y[:m])) / m)
    if multiplicative:
        seas0 = [yl[i] / level0 if level0 != 0 else 1.0 for i in range(m)]
    else:
        seas0 = [yl[i] - level0 for i in range(m)]

    def filt(a, b, g):
        lib2 = _cf()
        if lib2 is not None:
            # C twin of the loops below (same recursion as hw_sse,
            # trajectory stored; seas buffer ends as the final state)
            ya2 = np.ascontiguousarray(y, dtype=float)
            s0a2 = np.asarray(seas0, dtype=float)
            sb = np.empty(m, dtype=float)
            fbuf = np.empty(n, dtype=float)
            st = np.empty(2, dtype=float)
            lib2.hw_filt(_dp(ya2), n, m, 1 if multiplicative else 0,
                         a, b, g, level0, trend0, _dp(s0a2), _dp(sb),
                         _dp(fbuf), _dp(st))
            return fbuf, float(st[0]), float(st[1]), sb
        level = level0
        trend = trend0
        seas = seas0[:]
        fitted = [0.0] * n
        one_a, one_b, one_g = 1 - a, 1 - b, 1 - g
        if multiplicative:
            for t in range(n):
                i = t % m
                s = seas[i]
                lt = level + trend
                f = lt * s
                fitted[t] = f
                yt = yl[t]
                newl = a * (yt / s if s != 0 else yt) + one_a * lt
                seas[i] = g * (yt / newl if newl != 0 else s) + one_g * s
                trend = b * (newl - level) + one_b * trend
                level = newl
        else:
            for t in range(n):
                i = t % m
                s = seas[i]
                lt = level + trend
                f = lt + s
                fitted[t] = f
                yt = yl[t]
                newl = a * (yt - s) + one_a * lt
                seas[i] = g * (yt - newl) + one_g * s
                trend = b * (newl - level) + one_b * trend
                level = newl
        return (np.asarray(fitted, dtype=float), level, trend,
                np.asarray(seas, dtype=float))

    if alpha is None or beta is None or gamma is None:
        lib = _cf()
        if lib is not None:
            # whole Nelder-Mead in C (r13 second pass; see _holt):
            # objective = hw_sse with the same isfinite -> 1e300 guard
            ya = np.ascontiguousarray(y, dtype=float)
            seas0_a = np.asarray(seas0, dtype=float)
            sbuf = np.empty(m, dtype=float)
            mult_flag = 1 if multiplicative else 0
            out = np.empty(3, dtype=float)
            lib.nm_hw(_dp(ya), n, m, mult_flag, level0, trend0,
                      _dp(seas0_a), _dp(sbuf), _dp(out))
            a, b, g = float(out[0]), float(out[1]), float(out[2])
        else:
            # NOT inlined into a Python SSE-accumulating loop: measured
            # ~17% SLOWER than filt + the numpy residual tail here (the
            # per-step NaN branch outweighs the saved array ops — unlike
            # the small SES/Holt bodies where the inline variant wins ~20%)
            def sse(x):
                f, _, _, _ = filt(*x)
                v = _sq_err(y - f)
                return v if math.isfinite(v) else 1e300
            a, b, g = nelder_mead(sse, [0.3, 0.05, 0.1],
                                  bounds=[(0.01, 0.99), (0.01, 0.99),
                                          (0.01, 0.99)])
    else:
        a, b, g = float(alpha), float(beta), float(gamma)
    fitted, level, trend, seas = filt(a, b, g)
    steps = np.arange(1, h + 1, dtype=float)
    seas_f = np.array([seas[(n + s - 1) % m] for s in range(1, h + 1)])
    if multiplicative:
        point = (level + steps * trend) * seas_f
    else:
        point = level + steps * trend + seas_f
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    sse_v = _sq_err(res)
    aic, bic = _aic_bic(sse_v, n, 3 + m)
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"alpha": a, "beta": b, "gamma": g,
                                  "seasonal_period": m}, aic=aic, bic=bic)


def _seasonal_es(y, h, cl, season_length=1, alpha=0.3, optimized=False, **kw):
    """Per-phase simple exponential smoothing (no trend)."""
    m = max(int(season_length), 1)
    n = len(y)

    def filt(a):
        lib2 = _cf()
        if lib2 is not None and n > 0:
            # C twin of the loop below (same recursion as
            # seasonal_es_sse, trajectory stored)
            ya2 = np.ascontiguousarray(y, dtype=float)
            fbuf = np.empty(n, dtype=float)
            lvb = np.empty(m, dtype=float)
            lib2.seasonal_es_filt(_dp(ya2), n, m, a, _dp(fbuf), _dp(lvb))
            return fbuf, lvb
        levels = np.full(m, np.nan)
        fitted = np.empty(n)
        for t in range(n):
            ph = t % m
            if np.isnan(levels[ph]):
                levels[ph] = y[t]
                fitted[t] = np.nan
            else:
                fitted[t] = levels[ph]
                levels[ph] = a * y[t] + (1 - a) * levels[ph]
        return fitted, levels

    name = "SeasonalESOptimized" if optimized else "SeasonalES"
    if optimized:
        lib = _cf()
        if lib is not None:
            # whole golden-section search in C (r13 second pass; same
            # seasonal_es_sse objective — NaN level = unseen phase, NaN
            # residuals skipped)
            ya = np.ascontiguousarray(y, dtype=float)
            lvbuf = np.empty(m, dtype=float)
            alpha = lib.golden_seasonal_es(_dp(ya), n, m, _dp(lvbuf))
        else:
            # SSE accumulated inside a list-local recursion — see
            # _ses_sse for the bit-identity argument (warm-up fitted
            # values are NaN and contribute 0.0, matching _sq_err's
            # where-skip)
            yl = y.tolist() if isinstance(y, np.ndarray) else list(y)

            def sse(a):
                levels = [None] * m
                s_acc = 0.0
                one_a = 1 - a
                for t in range(n):
                    ph = t % m
                    lv = levels[ph]
                    # `lv != lv` re-seeds a NaN level exactly like the
                    # original's np.isnan branch (a NaN y re-seeds its
                    # phase)
                    if lv is None or lv != lv:
                        levels[ph] = yl[t]
                    else:
                        x = yl[t] - lv
                        if x == x:
                            s_acc += x * x
                        levels[ph] = a * yl[t] + one_a * lv
                return s_acc
            alpha = golden_section(sse, 0.01, 0.99)
    a = float(alpha)
    fitted, levels = filt(a)
    steps = np.arange(1, h + 1)
    point = np.array([levels[(n + s - 1) % m] for s in steps])
    point = np.where(np.isnan(point), np.nanmean(y), point)
    res = y - fitted
    sig = _sigma(res)
    width = sig * np.sqrt(1.0 + (steps - 1) * a * a)
    lo, up = _interval(point, width, cl)
    return ForecastResult(point, lo, up, name, fitted, res,
                          params={"alpha": a, "seasonal_period": m})


# ---------------------------------------------------------------------------
# ETS family (innovations state space, additive error; grid/NM-optimized)
# ---------------------------------------------------------------------------

_ETS_SPECS = ["NNN", "ANN", "AAN", "AAdN", "ANA", "AAA", "AAdA",
              "MNN", "MAN", "MAdN", "MNA", "MAA", "MNM", "MAM", "MAdM"]


def _parse_ets_spec(spec: str):
    s = spec.replace("d", "D")
    if len(s) == 4 and s[2] == "D":  # e.g. AADA from AAdA
        err, trend, seas, damped = s[0], s[1], s[3], True
    elif len(s) == 3:
        err, trend, seas, damped = s[0], s[1], s[2], False
    else:
        raise ValueError(f"invalid ETS spec: {spec}")
    return err, trend, seas, damped


def _log_abs_sum(mu):
    """Sequential sum of ln|mu_t| via ``math.log`` — bit-identical to
    DuckDB's ``ln`` fold (glibc log on both sides; np.log's SIMD path
    differs in the last ulp on ~25% of inputs, enough to flip an optimizer
    tie-break in the multiplicative-error likelihood).  C twin when
    available (same glibc log/fabs, same left-to-right order).

    Precondition: no element of ``mu`` may be +-0.0 — the in-repo call
    paths guarantee it (the filters abort on mu_t == 0 first). On a zero
    the two paths DIVERGE: the C twin returns -inf while the Python
    fallback raises ValueError from ``math.log(0)``; new callers must
    enforce the precondition rather than rely on either behavior."""
    lib = _cf()
    if lib is not None:
        a = np.ascontiguousarray(mu, dtype=float)
        if a.size == 0:
            return 0.0
        return lib.log_abs_sum(_dp(a), a.size)
    s = 0.0
    # iterate Python floats: looping a numpy array boxes one float64
    # object per element (tolist() round-trips the doubles exactly)
    for v in (mu.tolist() if isinstance(mu, np.ndarray) else mu):
        s += math.log(abs(v))
    return s


def _ets_mult(y, h, cl, trend, seas, damped, m, _name="ETS"):
    """True multiplicative-error innovations state space, ETS(M,T,S) for
    T in {N, A, Ad} x S in {N, A, M} — the Hyndman-Athanasopoulos Table 7.8
    error-correction recursions with relative error e_t = (y_t - mu_t)/mu_t,
    fit by minimizing the multiplicative-error -2logL =
    n*ln(sum(e^2)/n) + 2*sum(ln|mu_t|) (HA eq. 7.4/7.5, which makes AIC
    comparable with additive-error specs). Requires a strictly positive
    series. Intervals: mu_h +- z * |mu_h| * sigma_e * sqrt(step) — the
    relative-error analogue of the additive family's widening."""
    n = len(y)
    if np.any(~(y > 0)):
        raise ValueError(
            "multiplicative-error ETS requires a strictly positive series")
    has_trend = trend != "N"
    has_seas = seas != "N"

    def init_states():
        if has_seas:
            l0 = float(np.mean(y[:m]))
            b0 = (float(np.mean(y[m:2 * m])) - l0) / m if has_trend else 0.0
            if seas == "M":
                s0 = np.array([y[i] / l0 if l0 != 0 else 1.0
                               for i in range(m)])
            else:
                s0 = np.array([y[i] - l0 for i in range(m)])
        else:
            l0 = float(y[0])
            b0 = float(y[1] - y[0]) if has_trend and n > 1 else 0.0
            s0 = None
        return l0, b0, s0

    # plain-Python hot loop (see _holt.filt): identical per-step
    # expressions in the identical order, list locals instead of numpy
    # scalar indexing (the isfinite guard and the early None return are
    # unchanged). r13: the initial states do not depend on the smoothing
    # parameters — computed ONCE per series instead of once per
    # Nelder-Mead evaluation (same np.mean values, cached; the seasonal
    # warm-up list is copied per call), and mu/e stay plain lists until
    # the single post-optimization call converts them (the per-eval
    # np.asarray round trips were pure overhead).
    yl = np.asarray(y, dtype=float).tolist()
    l0, b0, s0 = init_states()
    s0l = None if s0 is None else s0.tolist()

    def filt(a, b, g, ph):
        lib2 = _cf()
        if lib2 is not None:
            # C twin of the loop below (same recursion as
            # ets_mult_neg2ll, trajectories stored); on the early abort
            # it falls through to the Python loop so the (None, None,
            # None) return — and the caller's unpack TypeError —
            # reproduces exactly
            ya2 = np.ascontiguousarray(y, dtype=float)
            s0a2 = (np.ascontiguousarray(s0, dtype=float)
                    if s0 is not None else np.empty(1, dtype=float))
            sb = np.empty(m if has_seas else 1, dtype=float)
            mu_b = np.empty(n, dtype=float)
            e_b = np.empty(n, dtype=float)
            st = np.empty(2, dtype=float)
            sk = 2 if seas == "M" else (1 if seas == "A" else 0)
            rc = lib2.ets_mult_filt(_dp(ya2), n, m,
                                    1 if has_trend else 0, sk, a, b, g,
                                    ph, l0, b0, _dp(s0a2), _dp(sb),
                                    _dp(mu_b), _dp(e_b), _dp(st))
            if rc == 0:
                return mu_b, e_b, (float(st[0]), float(st[1]),
                                   None if s0l is None else sb)
        level, trend_v = l0, b0
        s = None if s0l is None else s0l[:]
        mu = [0.0] * n
        e = [0.0] * n
        isfinite = math.isfinite
        for t in range(n):
            q = level + ph * trend_v if has_trend else level
            if seas == "M":
                sv = s[t % m]
                m_t = q * sv
            elif seas == "A":
                sv = s[t % m]
                m_t = q + sv
            else:
                sv = None
                m_t = q
            if m_t == 0 or not isfinite(m_t):
                return None, None, None
            mu[t] = m_t
            et = (yl[t] - m_t) / m_t
            e[t] = et
            if seas == "A":
                level = q + a * m_t * et
                if has_trend:
                    trend_v = ph * trend_v + b * m_t * et
                s[t % m] = sv + g * m_t * et
            else:  # S = N or M share the proportional updates
                level = q * (1.0 + a * et)
                if has_trend:
                    trend_v = ph * trend_v + b * q * et
                if seas == "M":
                    s[t % m] = sv * (1.0 + g * et)
        return mu, e, (level, trend_v, s)

    _lib = _cf()
    if _lib is not None:
        # whole Nelder-Mead in C (r13 second pass; see _holt): the C
        # driver builds the SAME x0/bounds from the spec flags and runs
        # the same ets_mult_neg2ll objective (internally guarded: early
        # 1e300 abort, se<=0 -> -1e300, isfinite)
        ya = np.ascontiguousarray(y, dtype=float)
        s0a = (np.ascontiguousarray(s0, dtype=float)
               if s0 is not None else np.empty(1, dtype=float))
        sbuf = np.empty(m if has_seas else 1, dtype=float)
        seas_kind = 2 if seas == "M" else (1 if seas == "A" else 0)
        trend_flag = 1 if has_trend else 0
        out = np.empty(4, dtype=float)
        d = _lib.nm_ets(_dp(ya), n, m, trend_flag, seas_kind,
                        1 if damped else 0, l0, b0, _dp(s0a), _dp(sbuf),
                        _dp(out))
        x = [float(v) for v in out[:d]]
    else:
        def neg2ll(x):
            i = 0
            a = x[i]; i += 1
            b = x[i] if has_trend else 0.0
            i += 1 if has_trend else 0
            g = x[i] if has_seas else 0.0
            i += 1 if has_seas else 0
            ph = x[i] if damped else 1.0
            mu, e, _ = filt(a, b, g, ph)
            if mu is None:
                return 1e300
            # sequential left-to-right accumulation == _seq_sum(e * e)
            # (np.cumsum walks the same order; same multiply-then-add per
            # element), without boxing the lists into arrays per evaluation
            se = 0.0
            for v in e:
                se += v * v
            if se <= 0:
                return -1e300
            v = n * math.log(se / n) + 2.0 * _log_abs_sum(mu)
            return v if math.isfinite(v) else 1e300

        x0, bounds = [0.3], [(0.01, 0.99)]
        if has_trend:
            x0.append(0.05); bounds.append((0.01, 0.99))
        if has_seas:
            x0.append(0.1); bounds.append((0.01, 0.99))
        if damped:
            x0.append(0.95); bounds.append((0.8, 0.995))
        x = nelder_mead(neg2ll, x0, bounds=bounds)
    i = 0
    a = float(x[i]); i += 1
    b = float(x[i]) if has_trend else None
    i += 1 if has_trend else 0
    g = float(x[i]) if has_seas else None
    i += 1 if has_seas else 0
    ph = float(x[i]) if damped else 1.0
    mu, e, (level, trend_v, s) = filt(a, b or 0.0, g or 0.0, ph)
    mu = np.asarray(mu, dtype=float)
    e = np.asarray(e, dtype=float)
    s = None if s is None else np.asarray(s, dtype=float)
    steps = np.arange(1, h + 1, dtype=float)
    if has_trend:
        phs = np.cumsum(ph ** steps) if damped else steps
        q = level + phs * trend_v
    else:
        q = np.full(h, level)
    if seas == "M":
        sf = np.array([s[(n + j - 1) % m] for j in range(1, h + 1)])
        point = q * sf
    elif seas == "A":
        sf = np.array([s[(n + j - 1) % m] for j in range(1, h + 1)])
        point = q + sf
    else:
        point = q
    sig_e = _sigma(e)
    width = np.abs(point) * sig_e * np.sqrt(steps)
    lo, up = _interval(point, width, cl)
    k = 1 + (1 if has_trend else 0) + (1 if has_seas else 0) + \
        (1 if damped else 0)
    se = _seq_sum(e * e)
    aic = n * math.log(se / n) + 2.0 * _log_abs_sum(mu) + 2 * k \
        if se > 0 else float("nan")
    bic = aic - 2 * k + k * math.log(n) if math.isfinite(aic) else float("nan")
    params = {"alpha": a, "seasonal_period": m}
    if b is not None:
        params["beta"] = b
    if g is not None:
        params["gamma"] = g
    if damped:
        params["phi"] = ph
    return ForecastResult(point, lo, up, _name, mu, y - mu, params=params,
                          aic=aic, bic=bic)


def _ets(y, h, cl, model="AAA", season_length=1, _name="ETS", **kw):
    """ETS with explicit spec string (ref forecast.rs ets_spec; default AAA).

    A-error specs route through the additive family; M-error specs run the
    true multiplicative-error state space (``_ets_mult``) with its own
    likelihood and relative-error intervals."""
    err, trend, seas, damped = _parse_ets_spec(model)
    m = max(int(season_length), 1)
    if seas != "N" and (m < 2 or len(y) < 2 * m):
        seas = "N"
    if err == "M":
        base = _ets_mult(np.asarray(y, dtype=float), h, cl, trend, seas,
                         damped, m, _name=_name)
    elif seas == "A" or seas == "M":
        base = _holt_winters(y, h, cl, season_length=m, multiplicative=(seas == "M"),
                             _name=_name)
    elif trend == "A":
        base = _holt(y, h, cl, damped=damped, _name=_name)
    elif trend == "N":
        base = _ses_optimized(y, h, cl)
        base.model_name = _name
    else:
        base = _ses_optimized(y, h, cl)
        base.model_name = _name
    base.params["spec"] = model
    base.params["seasonal_period"] = m
    return base


def _auto_ets(y, h, cl, season_length=1, model_pool=None, **kw):
    m = max(int(season_length), 1)
    if model_pool:
        pool = model_pool
    else:
        pool = ["ANN", "AAN", "AAdN"] + \
               (["ANA", "AAA", "AAdA"] if m >= 2 else [])
        # multiplicative-error / multiplicative-season specs join the pool
        # only when the series is strictly positive (ref forecast.rs spec
        # taxonomy; HA: M-error is undefined at y <= 0)
        if np.all(np.asarray(y, dtype=float) > 0):
            pool += ["MNN", "MAN"] + (["MNM", "MAM"] if m >= 2 else [])
    best, best_aic = None, float("inf")
    for spec in pool:
        try:
            r = _ets(y, h, cl, model=spec, season_length=m, _name="AutoETS")
            k = {"ANN": 1, "AAN": 2, "AAdN": 3, "ANA": 1 + m, "AAA": 3 + m,
                 "AAdA": 4 + m, "MNN": 1, "MAN": 2, "MAdN": 3,
                 "MNM": 1 + m, "MAM": 3 + m, "MAdM": 4 + m,
                 "MNA": 1 + m, "MAA": 3 + m}.get(spec, 3)
            # one consistent selection criterion across the whole pool:
            # additive-Gaussian AIC on the absolute residuals (y - fitted)
            sse = _sq_err(np.asarray(r.residuals, dtype=float))
            aic, _ = _aic_bic(sse, len(y), k)
        except Exception:
            continue
        if math.isfinite(aic) and aic < best_aic:
            best, best_aic = r, aic
            best.params["spec"] = spec
            best.aic = aic
    if best is None:
        best = _ses_optimized(y, h, cl)
        best.model_name = "AutoETS"
    return best


# ---------------------------------------------------------------------------
# Theta family (Assimakopoulos & Nikolopoulos 2000; Fiorucci et al. 2016)
# ---------------------------------------------------------------------------

def _seasonal_decompose_mult(y, m):
    """Classical multiplicative seasonal indices via centered MA."""
    n = len(y)
    if m < 2 or n < 2 * m:
        return np.ones(n), np.ones(m)
    k = m // 2
    ma = np.full(n, np.nan)
    c = np.concatenate([[0.0], np.cumsum(y)])
    # vectorized centered MA (r13): each output element is the same
    # left-assoc chain of elementwise IEEE ops the scalar loop performed
    # — no reductions, so the bits are unchanged
    ts = np.arange(k, n - k)
    if ts.size:
        if m % 2 == 0:
            # centered MA of even order: average of two adjacent MAs
            s = (c[ts + k] - c[ts - k] + c[ts + k + 1] - c[ts - k + 1]) / 2.0
            ma[ts] = s / m
        else:
            ma[ts] = (c[ts + k + 1] - c[ts - k]) / m
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(ma != 0, y / ma, np.nan)
    idx = np.full(m, 1.0)
    for ph in range(m):
        vals = ratio[ph::m]
        vals = vals[np.isfinite(vals)]
        if len(vals):
            # sequential fold: the downstream theta line / golden-section
            # alpha search branches on these values (see _seq_sum)
            idx[ph] = _seq_sum(vals) / len(vals)
    s = _seq_sum(idx)
    if s != 0:
        idx = idx * m / s
    seasonal = idx[np.arange(n) % m]  # pure indexing — exact copies
    return seasonal, idx


def _seasonality_test(y, m):
    """ACF-based seasonality check used by Theta (90% band)."""
    n = len(y)
    if m < 2 or n < 3 * m:
        return False
    x = y - y.mean()
    denom = float(np.sum(x * x))
    if denom == 0:
        return False
    acfs = [float(np.sum(x[: n - k] * x[k:]) / denom) for k in range(1, m + 1)]
    crit = 1.645 * math.sqrt((1 + 2 * sum(a * a for a in acfs[:-1])) / n)
    return abs(acfs[m - 1]) > crit


def _theta(y, h, cl, season_length=1, theta=2.0, dynamic=False, optimized=False,
           _name=None, **kw):
    """Standard/optimized/dynamic Theta.

    STheta: deseasonalize (multiplicative, if seasonal), theta-decompose,
    SES on the theta(=2) line, recombine with the linear-trend theta(0) line.
    Optimized: search theta in [1,5] (and SES alpha). Dynamic: the theta0
    line is re-estimated at each origin (approximated by weighting with the
    expanding mean — Fiorucci DSTM).
    """
    m = max(int(season_length), 1)
    n = len(y)
    seasonal = _seasonality_test(y, m) if m >= 2 else False
    if seasonal:
        seas, idx = _seasonal_decompose_mult(y, m)
        # degenerate (near-zero) multiplicative indices make y/seas overflow;
        # indices are normalized around 1, so tiny magnitudes mean the
        # multiplicative model doesn't apply to that phase — neutralize it
        seas = np.where(np.abs(seas) < 1e-8, 1.0, seas)
        x = y / seas
        if not np.all(np.isfinite(x)):
            x = y.copy()
            idx = None
            seasonal = False
    else:
        x = y.copy()
        idx = None
    t = np.arange(n, dtype=float)
    b1, b0 = _linfit(x)

    def run(th, a):
        # theta line: theta*x + (1-theta)*trendline
        theta_line = th * x + (1 - th) * (b0 + b1 * t)
        fitted, level = _ses_filter(theta_line, a)
        return theta_line, fitted, level

    # Theta-family optimizer (r13): the whole Nelder-Mead / golden-
    # section search runs in C when the library is available — the C
    # theta_sse objective fuses theta-line build, SES filter and
    # recombination into one pass with the identical IEEE op order, and
    # the C search loops twin models.nelder_mead / golden_section step
    # for step (see _cfilters.c), so the trajectory is bit-identical
    # either way. A fixed th == 0 falls back to Python so the scalar
    # 1/th ZeroDivisionError reproduces exactly.
    lib = _cf()
    c_ok = lib is not None and n > 0

    def _obj_py(th_, a_):
        theta_line, fitted, _ = run(th_, a_)
        comb = fitted / th_ + (1 - 1 / th_) * (b0 + b1 * t)
        return _sq_err(x - comb)

    if optimized:
        if c_ok:
            _xa = np.ascontiguousarray(x, dtype=float)
            out = np.empty(2, dtype=float)
            lib.nm_theta(_dp(_xa), n, b0, b1, _dp(out))
            th, a = float(out[0]), float(out[1])
        else:
            th, a = nelder_mead(lambda p: _obj_py(p[0], p[1]), [2.0, 0.3],
                                bounds=[(1.0, 5.0), (0.01, 0.99)])
    else:
        th = float(theta)
        if c_ok and th != 0.0:
            _xa = np.ascontiguousarray(x, dtype=float)
            a = lib.golden_theta(_dp(_xa), n, b0, b1, th)
        else:
            a = golden_section(lambda a_: _obj_py(th, a_), 0.01, 0.99)

    theta_line, fitted_ses, level = run(th, a)
    steps = np.arange(1, h + 1, dtype=float)
    ses_fc = np.full(h, level)
    if dynamic:
        # dynamic theta: drift term shrinks with horizon via expanding weight
        trend_fc = b0 + b1 * (n - 1 + steps * 0.5)
    else:
        trend_fc = b0 + b1 * (n - 1 + steps)
    point_x = ses_fc / th + (1 - 1 / th) * trend_fc
    fitted_x = fitted_ses / th + (1 - 1 / th) * (b0 + b1 * t)
    if seasonal:
        seas_f = idx[np.arange(n, n + h) % m]  # pure indexing
        point = point_x * seas_f
        fitted = fitted_x * seas
    else:
        point = point_x
        fitted = fitted_x
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    if _name is None:
        _name = ("DynamicOptimizedTheta" if dynamic and optimized else
                 "DynamicTheta" if dynamic else
                 "OptimizedTheta" if optimized else "Theta")
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"theta": th, "alpha": a, "seasonal_period": m,
                                  "variant": _name})


def _auto_theta(y, h, cl, season_length=1, **kw):
    cands = [
        _theta(y, h, cl, season_length=season_length, _name="AutoTheta"),
        _theta(y, h, cl, season_length=season_length, optimized=True, _name="AutoTheta"),
        _theta(y, h, cl, season_length=season_length, dynamic=True, _name="AutoTheta"),
        _theta(y, h, cl, season_length=season_length, dynamic=True, optimized=True,
               _name="AutoTheta"),
    ]
    sses = [_sq_err(np.asarray(c.residuals, dtype=float)) for c in cands]
    best = cands[int(np.argmin(sses))]
    return best


# ---------------------------------------------------------------------------
# ARIMA (CSS-estimated), AutoARIMA (small deterministic order search)
# ---------------------------------------------------------------------------

def _difference(y, d):
    for _ in range(d):
        y = np.diff(y)
    return y


def _arima_css(x, p, q, max_iter=80):
    """Conditional-sum-of-squares ARMA(p,q) fit on (already differenced,
    mean-adjusted) series. Returns (phi, theta, const, residuals, sse)."""
    n = len(x)
    mean = _seq_sum(x) / n if n else 0.0
    xc = x - mean

    # plain-Python hot loop (the AutoARIMA grid's dominant cost — one
    # call per Nelder-Mead step per (p,d,q) candidate): list locals
    # instead of numpy scalar indexing, identical subtraction order
    # (AR terms then MA terms), tolist() round-trips doubles exactly
    xcl = xc.tolist()

    def css(params):
        # params may be a list (nelder_mead) or ndarray (direct callers)
        phi = [float(v) for v in params[:p]]
        th = [float(v) for v in params[p:p + q]]
        e = [0.0] * n
        head = min(n, max(p, q))
        for t in range(head):
            acc = xcl[t]
            for i in range(p):
                if t - i - 1 >= 0:
                    acc -= phi[i] * xcl[t - i - 1]
            for j in range(q):
                if t - j - 1 >= 0:
                    acc -= th[j] * e[t - j - 1]
            e[t] = acc
        # steady state (every lag valid): unrolled per (p, q) for the
        # whole AutoARIMA grid (p <= 3, q <= 2). A chained subtraction
        # is the SAME left-assoc sequence as the repeated `acc -= ...`,
        # so the residuals are bit-identical; only the bounds checks and
        # inner-loop overhead are gone.
        rng_ = range(head, n)
        if q == 0 and p == 1:
            p0, = phi
            for t in rng_:
                e[t] = xcl[t] - p0 * xcl[t - 1]
        elif q == 0 and p == 2:
            p0, p1 = phi
            for t in rng_:
                e[t] = xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
        elif q == 0 and p == 3:
            p0, p1, p2 = phi
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
                        - p2 * xcl[t - 3])
        elif q == 1 and p == 0:
            t0, = th
            for t in rng_:
                e[t] = xcl[t] - t0 * e[t - 1]
        elif q == 1 and p == 1:
            p0, = phi
            t0, = th
            for t in rng_:
                e[t] = xcl[t] - p0 * xcl[t - 1] - t0 * e[t - 1]
        elif q == 1 and p == 2:
            p0, p1 = phi
            t0, = th
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
                        - t0 * e[t - 1])
        elif q == 1 and p == 3:
            p0, p1, p2 = phi
            t0, = th
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
                        - p2 * xcl[t - 3] - t0 * e[t - 1])
        elif q == 2 and p == 0:
            t0, t1 = th
            for t in rng_:
                e[t] = xcl[t] - t0 * e[t - 1] - t1 * e[t - 2]
        elif q == 2 and p == 1:
            p0, = phi
            t0, t1 = th
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - t0 * e[t - 1]
                        - t1 * e[t - 2])
        elif q == 2 and p == 2:
            p0, p1 = phi
            t0, t1 = th
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
                        - t0 * e[t - 1] - t1 * e[t - 2])
        elif q == 2 and p == 3:
            p0, p1, p2 = phi
            t0, t1 = th
            for t in rng_:
                e[t] = (xcl[t] - p0 * xcl[t - 1] - p1 * xcl[t - 2]
                        - p2 * xcl[t - 3] - t0 * e[t - 1] - t1 * e[t - 2])
        else:  # beyond the grid: generic fallback, same order
            for t in rng_:
                acc = xcl[t]
                for i in range(p):
                    acc -= phi[i] * xcl[t - i - 1]
                for j in range(q):
                    acc -= th[j] * e[t - j - 1]
                e[t] = acc
        return np.asarray(e, dtype=float)

    if p + q == 0:
        e = xc.copy()
        return np.zeros(0), np.zeros(0), mean, e, _seq_sum(e * e)

    # init: AR via OLS on lags, MA zero
    x0 = np.zeros(p + q)
    if p == 1 and n > 2:
        # single-lag case: explicit dot-product ratio, expression-identical
        # to the SQL oracle's init (lstsq's SVD differs in the last ulp,
        # which shifts the whole Nelder-Mead trajectory)
        num = _seq_sum(xc[:-1] * xc[1:])
        den = _seq_sum(xc[:-1] * xc[:-1])
        if den != 0:
            x0[0] = min(max(num / den, -0.95), 0.95)
    elif p > 0 and n > p + 1:
        # explicit normal-equations solve by Cramer's rule (p <= 3),
        # sequential-sum Gram entries — expression-identical to the
        # AutoARIMA grid oracle's SQL init (np.linalg.lstsq's SVD path
        # differs in the last ulp, which shifts the whole Nelder-Mead
        # trajectory; same determinism move as the TBATS normal equations)
        cols = [xc[p - i - 1: n - i - 1] for i in range(p)]
        yv = xc[p:]
        g = [[_seq_sum(cols[i] * cols[j]) for j in range(p)] for i in range(p)]
        b = [_seq_sum(cols[i] * yv) for i in range(p)]
        if p == 2:
            det = g[0][0] * g[1][1] - g[0][1] * g[1][0]
            if det != 0 and math.isfinite(det):
                c0 = (b[0] * g[1][1] - g[0][1] * b[1]) / det
                c1 = (g[0][0] * b[1] - b[0] * g[1][0]) / det
                x0[0] = min(max(c0, -0.95), 0.95)
                x0[1] = min(max(c1, -0.95), 0.95)
        elif p == 3:
            det = (g[0][0] * (g[1][1] * g[2][2] - g[1][2] * g[2][1])
                   - g[0][1] * (g[1][0] * g[2][2] - g[1][2] * g[2][0])
                   + g[0][2] * (g[1][0] * g[2][1] - g[1][1] * g[2][0]))
            if det != 0 and math.isfinite(det):
                c0 = (b[0] * (g[1][1] * g[2][2] - g[1][2] * g[2][1])
                      - g[0][1] * (b[1] * g[2][2] - g[1][2] * b[2])
                      + g[0][2] * (b[1] * g[2][1] - g[1][1] * b[2])) / det
                c1 = (g[0][0] * (b[1] * g[2][2] - g[1][2] * b[2])
                      - b[0] * (g[1][0] * g[2][2] - g[1][2] * g[2][0])
                      + g[0][2] * (g[1][0] * b[2] - b[1] * g[2][0])) / det
                c2 = (g[0][0] * (g[1][1] * b[2] - b[1] * g[2][1])
                      - g[0][1] * (g[1][0] * b[2] - b[1] * g[2][0])
                      + b[0] * (g[1][0] * g[2][1] - g[1][1] * g[2][0])) / det
                x0[0] = min(max(c0, -0.95), 0.95)
                x0[1] = min(max(c1, -0.95), 0.95)
                x0[2] = min(max(c2, -0.95), 0.95)

    _lib = _cf()
    if _lib is not None and p + q <= 6:
        # whole Nelder-Mead in C (r13 second pass; see _holt): same
        # chained-subtraction residual recursion and e*e sum as
        # css + _seq_sum, same isfinite -> 1e300 guard, same x0 — the
        # dim <= 6 cap matches the C stack buffers (the AutoARIMA grid
        # tops out at p+q = 5; larger direct calls keep the Python path)
        xa = np.ascontiguousarray(xc, dtype=float)
        x0a = np.ascontiguousarray(x0, dtype=float)
        ebuf = np.empty(max(n, 1), dtype=float)
        out = np.empty(p + q, dtype=float)
        _lib.nm_arima(_dp(xa), n, p, q, _dp(x0a), _dp(ebuf),
                      int(max_iter), _dp(out))
        sol = [float(v) for v in out]
        if n > 0:
            # final residual pass through the same C recursion (the
            # established css twin); its in-loop sum == _seq_sum(e*e)
            # (same left-to-right order, 0.0 + e0^2 == e0^2)
            sse_v = _lib.arima_css_sse(
                _dp(xa), n, p, q, _dp(out),
                _dp(out[p:]) if q else _dp(out), _dp(ebuf))
            return sol[:p], sol[p:p + q], mean, ebuf[:n].copy(), sse_v
    else:
        def objective(params):
            e = css(params)
            v = _seq_sum(e * e)
            return v if math.isfinite(v) else 1e300

        bounds = [(-0.99, 0.99)] * (p + q)
        sol = nelder_mead(objective, x0, bounds=bounds, max_iter=max_iter)
    e = css(sol)
    return sol[:p], sol[p:p + q], mean, e, _seq_sum(e * e)


def _arima(y, h, cl, p=1, d=0, q=0, _name="ARIMA", **kw):
    n0 = len(y)
    x = _difference(y, d)
    phi, th, mean, e, sse = _arima_css(x, int(p), int(q))
    p_, q_ = len(phi), len(th)
    xc = x - mean
    # iterate forecasts on the differenced scale
    hist = list(xc)
    errs = list(e)
    fc_diff = []
    for s in range(h):
        acc = 0.0
        for i in range(p_):
            v = hist[-i - 1] if len(hist) > i else 0.0
            acc += phi[i] * v
        for j in range(q_):
            idx = len(errs) - j - 1 + s  # future errors are 0
            if s - j - 1 < 0 and len(errs) + s - j - 1 < len(errs):
                acc += th[j] * errs[len(errs) + s - j - 1]
        fc_diff.append(acc)
        hist.append(acc)
    fc_diff = np.array(fc_diff) + mean
    # integrate back
    point = fc_diff.copy()
    if d > 0:
        tails = [y]
        for _ in range(d - 1):
            tails.append(np.diff(tails[-1]))
        for dd in range(d - 1, -1, -1):
            last = tails[dd][-1]
            point = last + np.cumsum(point)
    sig2 = sse / max(len(x) - p_ - q_ - 1, 1)
    sig = math.sqrt(max(sig2, 0.0))
    # psi weights for variance (AR recursion on MA(inf))
    psi = np.zeros(h)
    psi_full = np.zeros(h + 1)
    psi_full[0] = 1.0
    for s in range(1, h + 1):
        acc = th[s - 1] if s - 1 < q_ else 0.0
        for i in range(min(p_, s)):
            acc += phi[i] * psi_full[s - i - 1]
        psi_full[s] = acc
    var = np.cumsum(psi_full[:-1] ** 2) * sig2
    width = np.sqrt(var)
    if d > 0:
        width = width * np.sqrt(np.arange(1, h + 1, dtype=float))
    fitted_diff = xc - e + mean
    fitted = np.full(n0, np.nan)
    fitted[n0 - len(fitted_diff):] = fitted_diff if d == 0 else np.nan
    lo, up = _interval(point, width, cl)
    k = p_ + q_ + 1
    aic, bic = _aic_bic(sse, len(x), k)
    return ForecastResult(point, lo, up, _name, fitted, None,
                          params={"p": p_, "d": d, "q": q_, "phi": list(map(float, phi)),
                                  "theta": list(map(float, th)), "mean": mean},
                          aic=aic, bic=bic)


def _auto_arima(y, h, cl, season_length=1, **kw):
    """Deterministic small-grid AutoARIMA: d by variance-minimization (0..2),
    (p,q) over a fixed grid, selected by AICc on the CSS residuals."""
    best, best_aicc = None, float("inf")
    vars_ = []
    for d in range(3):
        xd = _difference(y, d)
        if len(xd) > 2:
            # sequential-sum variance so the selection is expression-
            # identical to the oracle's list_sum replay (np.var's pairwise
            # summation could flip d on a near-tie)
            mu = _seq_sum(xd) / len(xd)
            vars_.append(_seq_sum((xd - mu) ** 2) / len(xd))
        else:
            vars_.append(float("inf"))
    d = int(np.argmin(vars_))
    for p in range(4):
        for q in range(3):
            if p + q == 0 and d == 0:
                continue
            try:
                x = _difference(y, d)
                if len(x) < p + q + 3:
                    continue
                phi, th, mean, e, sse = _arima_css(x, p, q)
                n = len(x)
                k = p + q + 1
                aic, _ = _aic_bic(sse, n, k)
                denom = n - k - 1
                aicc = aic + (2 * k * (k + 1)) / denom if denom > 0 else float("inf")
            except Exception:
                continue
            if math.isfinite(aicc) and aicc < best_aicc:
                best_aicc = aicc
                best = (p, d, q)
    if best is None:
        best = (0, 1, 0) if len(y) > 3 else (0, 0, 0)
    r = _arima(y, h, cl, p=best[0], d=best[1], q=best[2], _name="AutoARIMA")
    return r


# ---------------------------------------------------------------------------
# MSTL / MFLES / TBATS (public-algorithm reimplementations, simplified)
# ---------------------------------------------------------------------------

def _stl_lite(y, m, iterations=2):
    """Lightweight STL: iterate (seasonal via phase-mean of detrended,
    trend via centered MA of deseasonalized)."""
    n = len(y)
    seasonal = np.zeros(n)
    trend = np.zeros(n)
    resid = y.copy()
    if m < 2 or n < 2 * m:
        b1, b0 = _linfit(y)
        t = np.arange(n, dtype=float)
        trend = b0 + b1 * t
        return trend, seasonal, y - trend
    for _ in range(iterations):
        detr = y - trend
        idx = np.zeros(m)
        for ph in range(m):
            vals = detr[ph::m]
            idx[ph] = float(np.mean(vals)) if len(vals) else 0.0
        idx = idx - idx.mean()
        seasonal = idx[np.arange(n) % m]  # pure indexing — exact copies
        deseas = y - seasonal
        # trend: centered MA window m (odd-ified); vectorized (r13) — the
        # same elementwise subtraction/division per output element
        w = m if m % 2 == 1 else m + 1
        k = w // 2
        c = np.concatenate([[0.0], np.cumsum(deseas)])
        ts = np.arange(n)
        a_ = np.maximum(0, ts - k)
        b_ = np.minimum(n, ts + k + 1)
        trend = (c[b_] - c[a_]) / (b_ - a_)
    resid = y - trend - seasonal
    return trend, seasonal, resid


def _mstl(y, h, cl, season_lengths=None, season_length=1, _name="MSTL", **kw):
    ms = season_lengths or ([season_length] if season_length and season_length > 1 else [])
    ms = [int(m) for m in ms if m and int(m) >= 2 and len(y) >= 2 * int(m)]
    n = len(y)
    deseas = y.copy()
    seasonals = []
    for m in sorted(set(ms)):
        trend, seasonal, _ = _stl_lite(deseas, m)
        seasonals.append((m, seasonal))
        deseas = deseas - seasonal
    # forecast the deseasonalized series with optimized SES + drift blend
    base = _ses_optimized(deseas, h, cl)
    t = np.arange(n, dtype=float)
    b1, b0 = _linfit(deseas)
    steps = np.arange(1, h + 1, dtype=float)
    point = 0.5 * base.point + 0.5 * (b0 + b1 * (n - 1 + steps))
    fitted = 0.5 * np.asarray(base.fitted) + 0.5 * (b0 + b1 * t)
    for m, seasonal in seasonals:
        idx = seasonal[:m] if n >= m else np.zeros(m)
        # phase continues from n
        last_cycle = seasonal[n - m:n] if n >= m else np.zeros(m)
        seas_f = last_cycle[(np.arange(1, h + 1) - 1) % m]  # pure indexing
        point = point + seas_f
        fitted = fitted + seasonal
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"seasonal_periods": [m for m, _ in seasonals]})


def _auto_mstl(y, h, cl, season_lengths=None, **kw):
    ms = season_lengths
    if not ms:
        m = detect_seasonality(y)
        ms = [m] if m > 1 else []
    r = _mstl(y, h, cl, season_lengths=ms, _name="AutoMSTL")
    return r


def _mfles(y, h, cl, season_lengths=None, season_length=1, iterations=3,
           _name="MFLES", **kw):
    """MFLES: gradient-boosted decomposition (median → linear → seasonal →
    smoother), following the published MFLES algorithm sketch."""
    n = len(y)
    ms = season_lengths or ([season_length] if season_length and season_length > 1 else [])
    ms = [int(m) for m in ms if m and int(m) >= 2 and n >= 2 * int(m)]
    t = np.arange(n, dtype=float)
    resid = y.copy()
    fitted = np.zeros(n)
    steps = np.arange(1, h + 1, dtype=float)
    point = np.zeros(h)
    # round 0: median
    med = float(np.median(resid))
    fitted += med
    point += med
    resid = y - fitted
    for it in range(int(iterations)):
        # linear trend boost (shrunk)
        b1, b0 = _linfit(resid)
        lr = 0.9 if it == 0 else 0.5
        fitted += lr * (b0 + b1 * t)
        point += lr * (b0 + b1 * (n - 1 + steps))
        resid = y - fitted
        # seasonal boosts
        for m in ms:
            idx = np.zeros(m)
            for ph in range(m):
                vals = resid[ph::m]
                idx[ph] = float(np.median(vals)) if len(vals) else 0.0
            seas = idx[np.arange(n) % m]                       # pure indexing
            seas_f = idx[(n + np.arange(1, h + 1) - 1) % m]    # pure indexing
            fitted += seas
            point += seas_f
            resid = y - fitted
        # ses smoother boost
        f_s, lvl = _ses_filter(resid, 0.3)
        fitted += f_s
        point += lvl * 0.5 ** it
        resid = y - fitted
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"seasonal_periods": ms, "iterations": int(iterations)})


def _auto_mfles(y, h, cl, season_lengths=None, **kw):
    if not season_lengths:
        m = detect_seasonality(y)
        season_lengths = [m] if m > 1 else []
    r = _mfles(y, h, cl, season_lengths=season_lengths, _name="AutoMFLES")
    return r


def _tbats(y, h, cl, season_lengths=None, season_length=1, use_box_cox=False,
           _name="TBATS", **kw):
    """TBATS substitute: harmonic (Fourier) regression per seasonal period +
    linear trend + AR(1) residual correction. Documented simplification of
    De Livera-Hyndman-Snyder TBATS; deterministic least squares."""
    n = len(y)
    ms = season_lengths or ([season_length] if season_length and season_length > 1 else [])
    ms = [float(m) for m in ms if m and float(m) >= 2 and n >= 2 * float(m)]
    x = y.copy()
    lam = None
    if use_box_cox:
        shift = 1.0 - min(0.0, float(np.min(x)))
        x = np.log(x + shift)
        lam = shift
    t = np.arange(n, dtype=float)
    cols = [np.ones(n), t]
    K_per = []
    for m in ms:
        K = min(3, max(1, int(m // 2)))
        K_per.append(K)
        for k in range(1, K + 1):
            cols.append(np.sin(2 * np.pi * k * t / m))
            cols.append(np.cos(2 * np.pi * k * t / m))
    X = np.column_stack(cols)
    beta, *_ = np.linalg.lstsq(X, x, rcond=None)
    fit_x = X @ beta
    resid = x - fit_x
    # AR(1) on residuals — sequential sums (mirrors the oracle's folds)
    if len(resid) > 3 and np.var(resid) > 0:
        rho = _seq_sum(resid[:-1] * resid[1:]) / _seq_sum(resid[:-1] * resid[:-1])
        rho = max(-0.95, min(0.95, rho))
    else:
        rho = 0.0
    tf = n - 1 + np.arange(1, h + 1, dtype=float)
    cols_f = [np.ones(h), tf]
    for m, K in zip(ms, K_per):
        for k in range(1, K + 1):
            cols_f.append(np.sin(2 * np.pi * k * tf / m))
            cols_f.append(np.cos(2 * np.pi * k * tf / m))
    Xf = np.column_stack(cols_f)
    point_x = Xf @ beta + resid[-1] * rho ** np.arange(1, h + 1)
    if use_box_cox:
        point = np.exp(point_x) - lam
        fitted = np.exp(fit_x) - lam
    else:
        point = point_x
        fitted = fit_x
    res = y - fitted
    sig = _sigma(res)
    steps = np.arange(1, h + 1, dtype=float)
    lo, up = _interval(point, sig * np.sqrt(steps), cl)
    return ForecastResult(point, lo, up, _name, fitted, res,
                          params={"seasonal_periods": ms, "rho": rho})


def _auto_tbats(y, h, cl, season_lengths=None, **kw):
    if not season_lengths:
        m = detect_seasonality(y)
        season_lengths = [m] if m > 1 else []
    cands = [_tbats(y, h, cl, season_lengths=season_lengths, use_box_cox=False,
                    _name="AutoTBATS")]
    if np.min(y) > 0:
        try:
            cands.append(_tbats(y, h, cl, season_lengths=season_lengths,
                                use_box_cox=True, _name="AutoTBATS"))
        except Exception:
            pass
    sses = [_sq_err(np.asarray(c.residuals, dtype=float)) for c in cands]
    return cands[int(np.argmin(sses))]


# ---------------------------------------------------------------------------
# Intermittent demand (Croston family / ADIDA / IMAPA / TSB)
# ---------------------------------------------------------------------------

def _croston_parts(y):
    nz = np.nonzero(y != 0)[0]
    sizes = y[nz]
    if len(nz) == 0:
        return np.array([]), np.array([])
    intervals = np.diff(np.concatenate([[-1], nz]))
    return sizes, intervals.astype(float)


def _croston(y, h, cl, variant="classic", **kw):
    sizes, intervals = _croston_parts(y)
    name = {"classic": "CrostonClassic", "optimized": "CrostonOptimized",
            "sba": "CrostonSBA"}[variant]
    if len(sizes) == 0:
        point = np.zeros(h)
        return ForecastResult(point, point.copy(), point.copy(), name,
                              np.zeros(len(y)), y - 0.0)
    if variant == "optimized":
        lib = _cf()
        if lib is not None:
            # whole golden-section search in C (r13 second pass): each
            # objective leg is ses_sse == _sq_err(y - _ses_filter(y, a)[0])
            # (the established in-loop-SSE twin), summed with one double
            # add exactly like the closure below
            sz = np.ascontiguousarray(sizes, dtype=float)
            iv = np.ascontiguousarray(intervals, dtype=float)
            alpha = lib.golden_croston(_dp(sz), len(sz), _dp(iv), len(iv))
        else:
            def sse(a):
                fs, zl = _ses_filter(sizes, a)
                fi, il = _ses_filter(intervals, a)
                return _sq_err(sizes - fs) + _sq_err(intervals - fi)
            alpha = golden_section(sse, 0.01, 0.99)
    else:
        alpha = 0.1
    _, z = _ses_filter(sizes, alpha)
    _, p = _ses_filter(intervals, alpha)
    rate = z / p if p != 0 else 0.0
    if variant == "sba":
        rate = rate * (1 - alpha / 2.0)
    point = np.full(h, rate)
    fitted = np.full(len(y), rate)
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, np.full(h, sig), cl)
    return ForecastResult(point, lo, up, name, fitted, res, params={"alpha": alpha})


def _adida(y, h, cl, **kw):
    """Aggregate-Disaggregate Intermittent Demand Approach."""
    nz = np.nonzero(y != 0)[0]
    if len(nz) < 2:
        return _croston(y, h, cl, variant="classic")
    mean_interval = max(1, int(round(float(np.mean(np.diff(np.concatenate([[-1], nz])))))))
    n = len(y)
    nb = n // mean_interval
    if nb < 2:
        return _croston(y, h, cl, variant="classic")
    trimmed = y[n - nb * mean_interval:]
    agg = trimmed.reshape(nb, mean_interval).sum(axis=1)
    _, level = _ses_filter(agg, 0.3)
    rate = level / mean_interval
    point = np.full(h, rate)
    fitted = np.full(n, rate)
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, np.full(h, sig), cl)
    return ForecastResult(point, lo, up, "ADIDA", fitted, res,
                          params={"aggregation": mean_interval})


def _imapa(y, h, cl, **kw):
    """Intermittent Multiple Aggregation Prediction Algorithm: average ADIDA
    rates across aggregation levels 1..mean-interval."""
    nz = np.nonzero(y != 0)[0]
    if len(nz) < 2:
        return _croston(y, h, cl, variant="classic")
    max_agg = max(1, int(round(float(np.mean(np.diff(np.concatenate([[-1], nz])))))))
    n = len(y)
    rates = []
    for lv in range(1, max_agg + 1):
        nb = n // lv
        if nb < 2:
            continue
        agg = y[n - nb * lv:].reshape(nb, lv).sum(axis=1)
        _, level = _ses_filter(agg, 0.3)
        rates.append(level / lv)
    rate = float(np.mean(rates)) if rates else 0.0
    point = np.full(h, rate)
    fitted = np.full(n, rate)
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, np.full(h, sig), cl)
    return ForecastResult(point, lo, up, "IMAPA", fitted, res,
                          params={"levels": len(rates)})


def _tsb(y, h, cl, alpha_d=0.2, alpha_p=0.2, **kw):
    """Teunter-Syntetos-Babai: smooth demand probability and size every period."""
    n = len(y)
    p = 1.0 if y[0] != 0 else 0.0
    z = y[0] if y[0] != 0 else float(np.mean(y[y != 0])) if (y != 0).any() else 0.0
    fitted = np.empty(n)
    for t in range(n):
        fitted[t] = p * z
        occ = 1.0 if y[t] != 0 else 0.0
        p = alpha_p * occ + (1 - alpha_p) * p
        if y[t] != 0:
            z = alpha_d * y[t] + (1 - alpha_d) * z
    point = np.full(h, p * z)
    res = y - fitted
    sig = _sigma(res)
    lo, up = _interval(point, np.full(h, sig), cl)
    return ForecastResult(point, lo, up, "TSB", fitted, res,
                          params={"alpha_d": alpha_d, "alpha_p": alpha_p})


# ---------------------------------------------------------------------------
# Laplace distributional forecaster (ref forecast.rs:45-88, README.md:33):
# likelihood-weighted mixture of leaves (EMA / drift / AR(1) / damped-Holt).
# ---------------------------------------------------------------------------

_LAPLACE_VARIANTS = {"auto": "auto", "auto_aid": "auto_aid",
                     "autoaid": "auto_aid", "aid": "auto_aid",
                     "skaters": "skaters", "skater": "skaters", "": "auto"}


def _laplace(y, h, cl, laplace_variant="auto", season_length=0,
             laplace_seasonal_batch_init=0, **kw):
    variant = _LAPLACE_VARIANTS.get(str(laplace_variant).strip().lower())
    if variant is None:
        raise ValueError(
            f"invalid laplace_variant {laplace_variant!r}: expected one of "
            "auto, auto_aid, skaters (forecast.rs:64-77)")
    n = len(y)
    leaves = []
    # core leaf pool (all variants): EMA / drift / AR(1) / damped-Holt
    # leaf 1: EMA
    f1, l1 = _ses_filter(y, 0.3)
    leaves.append(("ema", f1, np.full(h, l1)))
    # leaf 2: drift
    drift = (y[-1] - y[0]) / (n - 1) if n > 1 else 0.0
    f2 = np.concatenate([[np.nan], y[:-1] + drift])
    leaves.append(("drift", f2, y[-1] + drift * np.arange(1, h + 1)))
    # leaf 3: AR(1) — sequential sums (mirrors the oracle's list folds)
    xm = _seq_sum(y) / n
    xc = y - xm
    denom = _seq_sum(xc[:-1] * xc[:-1])
    rho = _seq_sum(xc[:-1] * xc[1:]) / denom if denom > 0 else 0.0
    rho = max(-0.98, min(0.98, rho))
    f3 = np.concatenate([[np.nan], xm + rho * xc[:-1]])
    leaves.append(("ar1", f3, xm + xc[-1] * rho ** np.arange(1, h + 1)))
    # leaf 4: damped Holt
    r4 = _holt(y, h, cl, damped=True, _name="Laplace")
    leaves.append(("damped_holt", np.asarray(r4.fitted), r4.point))
    if variant == "auto_aid":
        # AID-style demand-class selection (forecast.rs:56-58: "AID-based
        # distribution-family selection; best for retail SKU / intermittent-
        # demand panels"): classify by the Syntetos-Boylan ADI/CV^2 quadrant
        # and add the matching intermittent leaf, which the likelihood
        # weighting then favors exactly when the series is truly intermittent.
        nz = y[y != 0]
        adi = n / max(len(nz), 1)
        cv2 = (float(np.std(nz) / np.mean(nz)) ** 2
               if len(nz) > 1 and np.mean(nz) != 0 else 0.0)
        if adi >= 1.32:
            r_i = _croston(y, h, cl, variant="sba" if cv2 >= 0.49 else "classic")
        else:
            r_i = _tsb(y, h, cl)
        leaves.append(("aid_" + r_i.model_name.lower(),
                       np.asarray(r_i.fitted), r_i.point))
    elif variant == "skaters":
        # fuller skaters ensemble (forecast.rs:59-61): larger leaf set —
        # window average and theta join the pool; slower, more robust
        r_sma = _sma(y, h, cl, window=min(max(n // 4, 2), 12))
        leaves.append(("sma", np.asarray(r_sma.fitted), r_sma.point))
        r_th = _theta(y, h, cl, season_length=1)
        leaves.append(("theta", np.asarray(r_th.fitted), r_th.point))
    # optional seasonal-EMA leaf
    m = int(season_length)
    if m >= 2 and n >= 2 * m:
        r5 = _seasonal_es(y, h, cl, season_length=m, alpha=0.3)
        leaves.append(("seasonal_ema", np.asarray(r5.fitted), r5.point))
    # likelihood weights under Laplace errors: w ∝ exp(-MAE/b)
    maes = []
    for _, f, _fc in leaves:
        e = y - f
        e = e[np.isfinite(e)]
        maes.append(_seq_sum(np.abs(e)) / len(e) if len(e) else float("inf"))
    b = max(min(maes), 1e-9)
    ws = np.array([math.exp(-(m_ / b - 1.0)) if math.isfinite(m_) else 0.0 for m_ in maes])
    wsum = _seq_sum(ws)
    if wsum == 0:
        ws = np.ones(len(leaves))
        wsum = _seq_sum(ws)
    ws = ws / wsum
    point = np.zeros(h)
    for w, (_, _f, fc) in zip(ws, leaves):
        point += w * fc
    fitted = np.zeros(n)
    wf = np.zeros(n)
    for w, (_, f, _fc) in zip(ws, leaves):
        ok = np.isfinite(f)
        fitted[ok] += w * f[ok]
        wf[ok] += w
    fitted = np.where(wf > 0, fitted / np.maximum(wf, 1e-12), np.nan)
    res = y - fitted
    # Laplace intervals: b_hat = mean|res|; quantile of Laplace distribution
    e = res[np.isfinite(res)]
    b_hat = _seq_sum(np.abs(e)) / len(e) if len(e) else 0.0
    p_hi = 0.5 + cl / 2.0
    q = -b_hat * math.log(2 * (1 - p_hi))  # Laplace quantile at p_hi
    steps = np.sqrt(np.arange(1, h + 1, dtype=float))
    lo = point - q * steps
    up = point + q * steps
    seasonal_leaf = any(name == "seasonal_ema" for name, _, _ in leaves)
    # model-name format mirrors forecast.rs:1698-1702
    if seasonal_leaf and laplace_seasonal_batch_init:
        name = f"Laplace({variant},seasonal={m},batch_init)"
    elif seasonal_leaf:
        name = f"Laplace({variant},seasonal={m})"
    else:
        name = f"Laplace({variant})"
    return ForecastResult(point, lo, up, name, fitted, res,
                          params={"variant": variant,
                                  "weights": {leaf: float(w) for (leaf, _, _), w
                                              in zip(leaves, ws)}})


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

_DISPATCH = {
    "Naive": _naive,
    "RandomWalkDrift": _random_walk_drift,
    "SMA": _sma,
    "SeasonalNaive": _seasonal_naive,
    "SeasonalWindowAverage": _seasonal_window_average,
    "SES": _ses,
    "SESOptimized": _ses_optimized,
    "Holt": _holt,
    "HoltWinters": _holt_winters,
    "SeasonalES": lambda y, h, cl, **kw: _seasonal_es(y, h, cl, **kw),
    "SeasonalESOptimized": lambda y, h, cl, **kw: _seasonal_es(
        y, h, cl, optimized=True, **{k: v for k, v in kw.items() if k != "optimized"}),
    "ETS": _ets,
    "AutoETS": _auto_ets,
    "Theta": _theta,
    "OptimizedTheta": lambda y, h, cl, **kw: _theta(y, h, cl, optimized=True, **kw),
    "DynamicTheta": lambda y, h, cl, **kw: _theta(y, h, cl, dynamic=True, **kw),
    "DynamicOptimizedTheta": lambda y, h, cl, **kw: _theta(
        y, h, cl, dynamic=True, optimized=True, **kw),
    "AutoTheta": _auto_theta,
    "ARIMA": _arima,
    "AutoARIMA": _auto_arima,
    "MSTL": _mstl,
    "AutoMSTL": _auto_mstl,
    "MFLES": _mfles,
    "AutoMFLES": _auto_mfles,
    "TBATS": _tbats,
    "AutoTBATS": _auto_tbats,
    "CrostonClassic": lambda y, h, cl, **kw: _croston(y, h, cl, variant="classic"),
    "CrostonOptimized": lambda y, h, cl, **kw: _croston(y, h, cl, variant="optimized"),
    "CrostonSBA": lambda y, h, cl, **kw: _croston(y, h, cl, variant="sba"),
    "ADIDA": _adida,
    "IMAPA": _imapa,
    "TSB": _tsb,
    "Laplace": _laplace,
}

_PARAM_KEYS = {"window", "alpha", "beta", "gamma", "model", "model_pool", "theta",
               "alpha_d", "alpha_p", "p", "d", "q", "iterations", "use_box_cox",
               "laplace_variant", "laplace_seasonal_batch_init", "stl_method",
               # damped/phi: honored by _holt, and by the pure-Catalyst
               # _holt_sql fold — stripping them here made ts_forecast_by
               # (SQL fold) and ts_forecast (this path) disagree for
               # identical inputs (r10 ADVICE finding); every model fn
               # takes **kw, so unknown-to-a-model keys are inert
               "damped", "phi"}


def forecast(y, h: int, method: str, season_length: int = 0, level: float = 0.90,
             params: dict | None = None) -> ForecastResult:
    """Fit + forecast one series. ``y`` may contain NaN (interpolated).

    ``season_length=0`` triggers periodogram auto-detection for seasonal
    models (ref ``seasonality.rs:323``, ``ts_forecast_native.cpp:270-400``).
    """
    model = canonical_model(method)
    y = validate_series(np.asarray(y, dtype=float))
    params = dict(params or {})
    if params.get("model") and model != "ETS":
        # ref ts_forecast_native.cpp:270-400: 'model' (ETS spec string) is
        # only valid with method='ETS'; hard error otherwise
        raise ValueError(
            f"parameter 'model' is only valid with method='ETS', got {model}")
    m = int(params.get("seasonal_period", season_length) or 0)
    needs_season = model in SEASONAL_MODELS or model in (
        "AutoETS", "ETS", "Theta", "OptimizedTheta", "DynamicTheta",
        "DynamicOptimizedTheta", "AutoTheta", "Laplace")
    if m == 0 and needs_season:
        m = detect_seasonality(y)
    kw = {k: v for k, v in params.items() if k in _PARAM_KEYS}
    sp = params.get("seasonal_periods")
    if sp:
        kw["season_lengths"] = [int(v) for v in sp]
    fn = _DISPATCH[model]
    res = fn(y, int(h), float(level), season_length=m, **kw)
    return res
