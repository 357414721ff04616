"""Distribution kernels in pure numpy (no scipy in this environment).

Implements the subset of ``scipy.stats`` machinery the reference's stats
tier uses (``src/xclim/indices/stats.py:45-113`` fits per 1-D series;
``parametric_quantile/cdf/pdf`` :221-428): fit + ppf + cdf + pdf for
norm / lognorm / expon / gumbel_r / genextreme / gamma / fisk /
weibull_min / pearson3 (the last two: L-moment estimators from
Stedinger et al. 1993 and Hosking & Wallis 1997 App. A.9).

Methods: "ML" (closed form where exact, profiled Newton for gumbel,
Greenwood-Durand for gamma — the reference's "APP" start values,
stats.py:620-700), "MOM", and "PWM" (sample L-moments, Hosking 1990 —
the reference recommends PWM as robust; estimator formulas are the
published Hosking/Wallis ones).

Parameter layout matches scipy: ``(*shapes, loc, scale)``.

Special functions implemented from standard published algorithms:
* probit (inverse normal CDF): Acklam's rational approximation + one
  Halley refinement (|rel err| < 1e-15);
* regularized lower incomplete gamma P(a, x): series for x < a+1, Lentz
  continued fraction otherwise (Numerical Recipes scheme).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["DISTS", "lmoments", "probit", "gammainc_p", "fit_params",
           "ppf", "cdf", "pdf", "nparams"]

EULER = 0.5772156649015329
LN2 = math.log(2.0)


# ---------------------------------------------------------------------------
# special functions
# ---------------------------------------------------------------------------

_ACKLAM_A = (-3.969683028665376e01, 2.209460984245205e02,
             -2.759285104469687e02, 1.383577518672690e02,
             -3.066479806614716e01, 2.506628277459239e00)
_ACKLAM_B = (-5.447609879822406e01, 1.615858368580409e02,
             -1.556989798598866e02, 6.680131188771972e01,
             -1.328068155288572e01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e00, -2.549732539343734e00,
             4.374664141464968e00, 2.938163982698783e00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e00, 3.754408661907416e00)


def probit(q):
    """Inverse standard normal CDF (Acklam 2003 + Halley step)."""
    q = np.asarray(q, dtype=float)
    out = np.full_like(q, np.nan)
    lo = (q > 0) & (q < 0.02425)
    hi = (q > 1 - 0.02425) & (q < 1)
    mid = (q >= 0.02425) & (q <= 1 - 0.02425)

    def tail(p):
        z = np.sqrt(-2.0 * np.log(p))
        num = ((((_ACKLAM_C[0] * z + _ACKLAM_C[1]) * z + _ACKLAM_C[2]) * z
                + _ACKLAM_C[3]) * z + _ACKLAM_C[4]) * z + _ACKLAM_C[5]
        den = (((_ACKLAM_D[0] * z + _ACKLAM_D[1]) * z + _ACKLAM_D[2]) * z
               + _ACKLAM_D[3]) * z + 1.0
        return num / den

    out[lo] = tail(q[lo])
    out[hi] = -tail(1.0 - q[hi])
    if mid.any():
        p = q[mid] - 0.5
        r = p * p
        num = ((((_ACKLAM_A[0] * r + _ACKLAM_A[1]) * r + _ACKLAM_A[2]) * r
                + _ACKLAM_A[3]) * r + _ACKLAM_A[4]) * r + _ACKLAM_A[5]
        den = ((((_ACKLAM_B[0] * r + _ACKLAM_B[1]) * r + _ACKLAM_B[2]) * r
                + _ACKLAM_B[3]) * r + _ACKLAM_B[4]) * r + 1.0
        out[mid] = p * num / den
    # one Halley refinement using erf
    v = np.vectorize(math.erf)
    ok = np.isfinite(out)
    if ok.any():
        x = out[ok]
        e = 0.5 * (1.0 + v(x / math.sqrt(2.0))) - q[ok]
        u = e * math.sqrt(2.0 * math.pi) * np.exp(x * x / 2.0)
        out[ok] = x - u / (1.0 + x * u / 2.0)
    out[q == 0] = -np.inf
    out[q == 1] = np.inf
    return out


def _norm_cdf(x):
    v = np.vectorize(math.erf)
    return 0.5 * (1.0 + v(np.asarray(x, dtype=float) / math.sqrt(2.0)))


_lgamma_ufunc = np.frompyfunc(math.lgamma, 1, 1)


def _lgamma(a):
    """Elementwise ``math.lgamma`` — bitwise-identical to the scalar path
    so array-shape evaluation can't drift from the scalar one."""
    return np.asarray(_lgamma_ufunc(np.asarray(a, dtype=float)),
                      dtype=float)


def gammainc_p(a, x):
    """Regularized lower incomplete gamma P(a, x) (series for x < a+1,
    Lentz continued fraction above, Wilson-Hilferty asymptotic for large
    shape — the series/CF need O(sqrt(a)) terms, which both costs and
    loses accuracy for the near-Gaussian a > 1e4 regime).

    ``a`` may be a scalar or an array broadcastable against ``x`` — the
    array form powers the row-vectorized parameter-table evaluators
    (:func:`ppf_rows` etc.); per-element arithmetic is identical to the
    scalar path."""
    a, x = np.broadcast_arrays(
        np.asarray(a, dtype=float), np.asarray(x, dtype=float))
    out = np.zeros(a.shape)
    fin = np.isfinite(a) & (a > 0) & np.isfinite(x)
    wh = fin & (a > 200.0)
    if wh.any():
        # WH: ((x/a)^(1/3) - (1 - 1/(9a))) * 3 sqrt(a) ~ N(0,1);
        # relative error < 1e-4 well before a = 200
        aw, xw = a[wh], x[wh]
        z = ((xw / aw) ** (1.0 / 3.0) - (1.0 - 1.0 / (9.0 * aw))) * \
            3.0 * np.sqrt(aw)
        out[wh] = np.where(xw > 0, _norm_cdf(z), 0.0)
    ser = fin & ~wh & (x > 0) & (x < a + 1.0)
    cf = fin & ~wh & (x >= a + 1.0)
    if ser.any():
        xs, as_ = x[ser], a[ser]
        ap = as_.copy()
        s = 1.0 / as_
        delta = s.copy()
        for _ in range(800):
            ap += 1.0
            delta = delta * xs / ap
            s += delta
            if np.all(np.abs(delta) < np.abs(s) * 1e-15):
                break
        out[ser] = s * np.exp(-xs + as_ * np.log(xs) - _lgamma(as_))
    if cf.any():
        xc, ac = x[cf], a[cf]
        b = xc + 1.0 - ac
        c = np.full_like(xc, 1e308)
        d = 1.0 / b
        h = d.copy()
        for i in range(1, 800):
            an = -i * (i - ac)
            b = b + 2.0
            d = an * d + b
            d[np.abs(d) < 1e-300] = 1e-300
            c = b + an / c
            c[np.abs(c) < 1e-300] = 1e-300
            d = 1.0 / d
            delta = d * c
            h *= delta
            if np.all(np.abs(delta - 1.0) < 1e-15):
                break
        out[cf] = 1.0 - np.exp(-xc + ac * np.log(xc) - _lgamma(ac)) * h
    # non-finite a/x keep the legacy value 0 (NaN comparisons were False in
    # the scalar masks); `fin` only guards the iteration loops from
    # NaN-poisoned never-converging elements
    return np.clip(out, 0.0, 1.0)


def _gamma_ppf_std(a, q):
    """Standard-gamma quantile by bisection on P(a, x) (robust; batches are
    bounded so the ~90 evaluations are cheap).  ``a`` scalar or array."""
    a, q = np.broadcast_arrays(
        np.asarray(a, dtype=float), np.asarray(q, dtype=float))
    lo = np.zeros(q.shape)
    hi = np.maximum(a * 20.0 + 100.0, 100.0)
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        below = gammainc_p(a, mid) < q
        lo = np.where(below, mid, lo)
        hi = np.where(below, hi, mid)
        if np.all(hi - lo < 1e-12 * (1.0 + hi)):
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# sample L-moments (Hosking 1990 unbiased PWM estimators)
# ---------------------------------------------------------------------------

def lmoments(x) -> tuple[float, float, float]:
    """(l1, l2, t3) from a 1-D sample."""
    x = np.sort(np.asarray(x, dtype=float))
    n = len(x)
    i = np.arange(n, dtype=float)
    b0 = x.mean()
    b1 = np.sum(i * x) / (n * (n - 1.0))
    b2 = np.sum(i * (i - 1.0) * x) / (n * (n - 1.0) * (n - 2.0)) if n > 2 \
        else 0.0
    l1 = b0
    l2 = 2.0 * b1 - b0
    l3 = 6.0 * b2 - 6.0 * b1 + b0
    t3 = l3 / l2 if l2 != 0 else 0.0
    return l1, l2, t3


# ---------------------------------------------------------------------------
# per-distribution fit / ppf / cdf / pdf
# ---------------------------------------------------------------------------

def _fit_norm(x, method):
    if method == "PWM":
        l1, l2, _ = lmoments(x)
        return (l1, l2 * math.sqrt(math.pi))
    return (float(np.mean(x)), float(np.std(x)))


def _fit_expon(x, method):
    if method == "PWM":
        l1, l2, _ = lmoments(x)
        return (l1 - 2.0 * l2, 2.0 * l2)
    m = float(np.min(x))
    return (m, float(np.mean(x)) - m)


def _fit_gumbel(x, method):
    if method in ("PWM",):
        l1, l2, _ = lmoments(x)
        scale = l2 / LN2
        return (l1 - EULER * scale, scale)
    if method == "MOM":
        scale = float(np.std(x)) * math.sqrt(6.0) / math.pi
        return (float(np.mean(x)) - EULER * scale, scale)
    # ML: profile likelihood Newton on scale (standard Gumbel MLE system)
    x = np.asarray(x, dtype=float)
    s = float(np.std(x)) * math.sqrt(6.0) / math.pi or 1.0
    for _ in range(100):
        e = np.exp(-x / s)
        A = np.sum(x * e) / np.sum(e)
        g = s - np.mean(x) + A
        # derivative via numerical step (smooth, well-conditioned)
        h = s * 1e-6
        e2 = np.exp(-x / (s + h))
        g2 = (s + h) - np.mean(x) + np.sum(x * e2) / np.sum(e2)
        step = g / ((g2 - g) / h)
        s -= step
        if abs(step) < 1e-12 * s:
            break
    loc = -s * math.log(float(np.mean(np.exp(-x / s))))
    return (loc, s)


def _fit_genextreme(x, method):
    # L-moment estimator (Hosking et al. 1985), scipy sign convention for c
    l1, l2, t3 = lmoments(x)
    z = 2.0 / (3.0 + t3) - LN2 / math.log(3.0)
    k = 7.8590 * z + 2.9554 * z * z
    g = math.gamma(1.0 + k)
    scale = l2 * k / ((1.0 - 2.0 ** (-k)) * g)
    loc = l1 - scale * (1.0 - g) / k
    return (k, loc, scale)


def _fit_gamma(x, method):
    x = np.asarray(x, dtype=float)
    if method == "PWM":
        # Hosking's rational approximation from t = l2/l1
        l1, l2, _ = lmoments(x)
        t = l2 / l1
        if t < 0.5:
            z = math.pi * t * t
            a = (1.0 - 0.3080 * z) / (
                z - 0.05812 * z * z + 0.01765 * z ** 3)
        else:
            z = 1.0 - t
            a = (0.7213 * z - 0.5947 * z * z) / (
                1.0 - 2.1817 * z + 1.2113 * z * z)
        return (a, 0.0, l1 / a)
    # Greenwood-Durand / Thom approximation (the reference's APP start,
    # stats.py:620-700)
    xp = x[x > 0]
    s = math.log(float(np.mean(xp))) - float(np.mean(np.log(xp)))
    if s <= 0:
        return (np.nan, np.nan, np.nan)
    a = (3.0 - s + math.sqrt((s - 3.0) ** 2 + 24.0 * s)) / (12.0 * s)
    return (a, 0.0, float(np.mean(xp)) / a)


def _fit_lognorm(x, method):
    lx = np.log(np.asarray(x, dtype=float))
    mu, sigma = float(np.mean(lx)), float(np.std(lx))
    return (sigma, 0.0, math.exp(mu))


def _fit_fisk(x, method):
    """3-parameter log-logistic via PWMs (Vicente-Serrano et al. 2010,
    the canonical SPEI fit; Singh-Guo 1995 estimators).

    Descending PWMs ``a_s = E[X (1-F)^s]`` derive from the ascending
    ``b_r`` (Hosking): a0 = b0, a1 = b0 - b1, a2 = b0 - 2 b1 + b2.
    scipy parameter order: (c=shape beta, loc=gamma, scale=alpha).
    """
    x = np.sort(np.asarray(x, dtype=float))
    n = len(x)
    i = np.arange(n, dtype=float)
    b0 = x.mean()
    b1 = np.sum(i * x) / (n * (n - 1.0))
    b2 = np.sum(i * (i - 1.0) * x) / (n * (n - 1.0) * (n - 2.0)) if n > 2 \
        else 0.0
    a0, a1, a2 = b0, b0 - b1, b0 - 2.0 * b1 + b2
    # beta = (2a1-a0)/(6a1-a0-6a2) == l2/l3 == 1/t3 exactly.  The
    # log-logistic cannot represent t3 <= 0 (left-skew/symmetric
    # samples), so clamp beta: as beta -> inf the fisk converges to a
    # logistic matching l1/l2, the right degenerate limit for
    # symmetric data (keeps near-normal months fittable instead of NaN).
    l2 = 2.0 * b1 - b0
    l3 = 6.0 * b2 - 6.0 * b1 + b0
    if l2 <= 0.0:
        return (np.nan, np.nan, np.nan)
    t3 = l3 / l2
    beta = 1.0 / max(t3, 1.0 / 150.0)
    if not (beta > 1.0):  # Gamma(1-1/beta) needs beta > 1
        return (np.nan, np.nan, np.nan)
    g = math.gamma(1.0 + 1.0 / beta) * math.gamma(1.0 - 1.0 / beta)
    alpha = (a0 - 2.0 * a1) * beta / g
    gamma_loc = a0 - alpha * g
    if alpha <= 0.0:
        return (np.nan, np.nan, np.nan)
    return (beta, gamma_loc, alpha)


def _fit_weibull(x, method):
    """2-parameter Weibull (loc fixed at 0 — the natural-zero variables
    the reference fits weibull_min to: wind speed, precipitation).

    PWM: with loc=0, t = l2/l1 = 1 - 2**(-1/c) exactly, so
    c = -ln2 / ln(1-t) and scale = l1 / Gamma(1+1/c) (Stedinger et al.
    1993).  ML: profile Newton on c for the standard Weibull MLE system
    g(c) = sum(x^c ln x)/sum(x^c) - 1/c - mean(ln x) = 0, then
    scale = mean(x^c)^(1/c)."""
    x = np.asarray(x, dtype=float)
    x = x[x > 0]
    if len(x) <= 1:
        return (np.nan, np.nan, np.nan)
    l1, l2, _ = lmoments(x)
    t = l2 / l1
    if not (0.0 < t < 1.0):
        return (np.nan, np.nan, np.nan)
    c = -LN2 / math.log1p(-t)
    if method == "PWM":
        return (c, 0.0, l1 / math.gamma(1.0 + 1.0 / c))
    lx = np.log(x)
    mlx = float(np.mean(lx))
    for _ in range(100):
        xc = np.power(x, c)
        g = float(np.sum(xc * lx) / np.sum(xc)) - 1.0 / c - mlx
        h = c * 1e-6
        xch = np.power(x, c + h)
        g2 = float(np.sum(xch * lx) / np.sum(xch)) - 1.0 / (c + h) - mlx
        d = (g2 - g) / h
        if d == 0:
            break
        step = g / d
        c -= step
        if not (c > 0):
            return (np.nan, np.nan, np.nan)
        if abs(step) < 1e-12 * c:
            break
    scale = float(np.mean(np.power(x, c))) ** (1.0 / c)
    return (c, 0.0, scale)


def _fit_pearson3(x, method):
    """Pearson III, scipy layout (skew, loc=mean, scale=std).

    PWM: Hosking & Wallis (1997, Appendix A.9) rational approximations
    for the shape alpha from |t3|, then skew = 2/sqrt(alpha),
    std = l2 sqrt(pi a) Gamma(a)/Gamma(a+1/2) (via lgamma — no
    overflow at small skew), loc = l1.  ML/MOM: moment estimators with
    the bias-adjusted Fisher-Pearson skew G1 = g1 sqrt(n(n-1))/(n-2)
    (the standard hydrology estimator; a closed-form stand-in for
    scipy's iterative MLE, same APP policy as the gamma fit)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if method == "PWM":
        l1, l2, t3 = lmoments(x)
        if l2 <= 0:
            return (np.nan, np.nan, np.nan)
        at3 = abs(t3)
        if at3 < 1e-9:
            return (0.0, l1, l2 * math.sqrt(math.pi))
        if at3 < 1.0 / 3.0:
            z = 3.0 * math.pi * t3 * t3
            a = (1.0 + 0.2906 * z) / (
                z + 0.1882 * z * z + 0.0442 * z ** 3)
        else:
            z = 1.0 - at3
            a = (0.36067 * z - 0.59567 * z * z + 0.25361 * z ** 3) / (
                1.0 - 2.78861 * z + 2.56096 * z * z - 0.77045 * z ** 3)
        skew = math.copysign(2.0 / math.sqrt(a), t3)
        std = l2 * math.sqrt(math.pi * a) * math.exp(
            math.lgamma(a) - math.lgamma(a + 0.5))
        return (skew, l1, std)
    mu = float(np.mean(x))
    sd = float(np.std(x))
    if sd == 0 or n < 3:
        return (np.nan, np.nan, np.nan)
    g1 = float(np.mean((x - mu) ** 3)) / sd ** 3
    G1 = g1 * math.sqrt(n * (n - 1.0)) / (n - 2.0)
    return (G1, mu, sd)


def _p3_split(p):
    """(skew, loc, scale) columns -> (near-zero-skew mask, alpha, beta,
    zeta) of the shifted-gamma representation: X = zeta + beta*G(alpha)
    with beta carrying skew's sign (scipy's internal transform)."""
    skew, loc, scale = (np.asarray(v, dtype=float) for v in p)
    small = np.abs(skew) < 1e-8
    sk = np.where(small, 1.0, skew)  # dummy, masked out downstream
    alpha = 4.0 / (sk * sk)
    beta = 0.5 * scale * sk
    zeta = loc - 2.0 * scale / sk
    return small, alpha, beta, zeta, loc, scale


def _p3_ppf(p, q):
    small, a, b, z, loc, scale = _p3_split(p)
    q = np.asarray(q, dtype=float)
    qq = np.where(b >= 0, q, 1.0 - q)
    with np.errstate(all="ignore"):
        g = z + b * _gamma_ppf_std(a, qq)
        n = loc + scale * probit(q)
    return np.where(small, n, g)


def _p3_cdf(p, x):
    small, a, b, z, loc, scale = _p3_split(p)
    x = np.asarray(x, dtype=float)
    with np.errstate(all="ignore"):
        t = np.maximum((x - z) / np.where(b == 0, 1.0, b), 0.0)
        gp = gammainc_p(a, t)
        g = np.where(b >= 0, gp, 1.0 - gp)
        n = _norm_cdf((x - loc) / scale)
    return np.where(small, n, g)


def _p3_pdf(p, x):
    small, a, b, z, loc, scale = _p3_split(p)
    x = np.asarray(x, dtype=float)
    with np.errstate(all="ignore"):
        t = (x - z) / np.where(b == 0, 1.0, b)
        g = np.where(
            t > 0,
            np.exp((a - 1.0) * np.log(np.maximum(t, 1e-300)) - t
                   - _lgamma(a)) / np.abs(b),
            0.0)
        n = np.exp(-((x - loc) ** 2) / (2.0 * scale ** 2)) / (
            scale * math.sqrt(2.0 * math.pi))
    return np.where(small, n, g)


DISTS = {
    "norm": {
        "nparams": 2,
        "fit": _fit_norm,
        "ppf": lambda p, q: p[0] + p[1] * probit(q),
        "cdf": lambda p, x: _norm_cdf((np.asarray(x) - p[0]) / p[1]),
        "pdf": lambda p, x: np.exp(
            -((np.asarray(x) - p[0]) ** 2) / (2 * p[1] ** 2)
        ) / (p[1] * math.sqrt(2 * math.pi)),
    },
    "expon": {
        "nparams": 2,
        "fit": _fit_expon,
        "ppf": lambda p, q: p[0] - p[1] * np.log1p(-np.asarray(q, float)),
        "cdf": lambda p, x: 1.0 - np.exp(-(np.asarray(x) - p[0]) / p[1]),
        "pdf": lambda p, x: np.exp(-(np.asarray(x) - p[0]) / p[1]) / p[1],
    },
    "gumbel_r": {
        "nparams": 2,
        "fit": _fit_gumbel,
        "ppf": lambda p, q: p[0] - p[1] * np.log(-np.log(np.asarray(q,
                                                                    float))),
        "cdf": lambda p, x: np.exp(
            -np.exp(-(np.asarray(x, float) - p[0]) / p[1])),
        "pdf": lambda p, x: (lambda z: np.exp(-z - np.exp(-z)) / p[1])(
            (np.asarray(x, float) - p[0]) / p[1]),
    },
    "genextreme": {
        "nparams": 3,
        "fit": _fit_genextreme,
        # scipy convention: ppf = loc + scale*(1 - (-ln q)^c)/c
        "ppf": lambda p, q: p[1] + p[2] * (
            1.0 - (-np.log(np.asarray(q, float))) ** p[0]) / p[0],
        "cdf": lambda p, x: np.exp(
            -np.power(np.maximum(1.0 - p[0] * (np.asarray(x, float) - p[1])
                                 / p[2], 1e-300), 1.0 / p[0])),
        # scipy c-convention: t = (1-cz)^(1/c); pdf = e^-t t^(1-c)/scale
        "pdf": lambda p, x: (lambda t: np.exp(-t) * np.power(t, 1.0 - p[0])
                             / p[2])(
            np.power(np.maximum(1.0 - p[0] * (np.asarray(x, float) - p[1])
                                / p[2], 1e-300), 1.0 / p[0])),
    },
    "gamma": {
        "nparams": 3,
        "fit": _fit_gamma,
        "ppf": lambda p, q: p[1] + p[2] * _gamma_ppf_std(
            p[0], np.asarray(q, float)),
        "cdf": lambda p, x: gammainc_p(
            p[0], np.maximum((np.asarray(x, float) - p[1]) / p[2], 0.0)),
        "pdf": lambda p, x: (lambda z: np.where(
            z > 0, np.exp((p[0] - 1.0) * np.log(np.maximum(z, 1e-300)) - z
                          - _lgamma(p[0])) / p[2], 0.0))(
            (np.asarray(x, float) - p[1]) / p[2]),
    },
    "weibull_min": {
        "nparams": 3,
        "fit": _fit_weibull,
        "ppf": lambda p, q: p[1] + p[2] * np.power(
            -np.log1p(-np.asarray(q, float)), 1.0 / p[0]),
        "cdf": lambda p, x: 1.0 - np.exp(-np.power(
            np.maximum((np.asarray(x, float) - p[1]) / p[2], 0.0), p[0])),
        "pdf": lambda p, x: (lambda z: np.where(
            z > 0, (p[0] / p[2]) * np.power(np.maximum(z, 1e-300),
                                            p[0] - 1.0)
            * np.exp(-np.power(np.maximum(z, 1e-300), p[0])), 0.0))(
            (np.asarray(x, float) - p[1]) / p[2]),
    },
    "pearson3": {
        "nparams": 3,
        "fit": _fit_pearson3,
        "ppf": _p3_ppf,
        "cdf": _p3_cdf,
        "pdf": _p3_pdf,
    },
    "fisk": {
        "nparams": 3,
        "fit": _fit_fisk,
        "ppf": lambda p, q: p[1] + p[2] * np.power(
            (lambda qq: qq / (1.0 - qq))(np.asarray(q, float)), 1.0 / p[0]),
        "cdf": lambda p, x: 1.0 / (1.0 + np.power(
            p[2] / np.maximum(np.asarray(x, float) - p[1], 1e-300), p[0])),
        "pdf": lambda p, x: (lambda z: (p[0] / p[2]) * np.power(z, p[0] - 1)
                             / (1.0 + np.power(z, p[0])) ** 2)(
            np.maximum((np.asarray(x, float) - p[1]) / p[2], 1e-300)),
    },
    "lognorm": {
        "nparams": 3,
        "fit": _fit_lognorm,
        "ppf": lambda p, q: p[1] + p[2] * np.exp(p[0] * probit(q)),
        "cdf": lambda p, x: _norm_cdf(
            np.log(np.maximum(np.asarray(x, float) - p[1], 1e-300) / p[2])
            / p[0]),
        "pdf": lambda p, x: (lambda y: np.where(
            y > 0, np.exp(-np.log(np.maximum(y / p[2], 1e-300)) ** 2
                          / (2.0 * p[0] ** 2))
            / (np.maximum(y, 1e-300) * p[0] * math.sqrt(2 * math.pi)),
            0.0))(np.asarray(x, float) - p[1]),
    },
}


def nparams(dist: str) -> int:
    return DISTS[dist]["nparams"]


def fit_params(x, dist: str, method: str = "ML"):
    """Fit on the valid values of a 1-D sample; NaN params when degenerate
    (mirrors reference _fitfunc_1d, stats.py:45-113)."""
    x = np.asarray(x, dtype=float)
    x = x[np.isfinite(x)]
    k = nparams(dist)
    if len(x) <= 1:
        return np.full(k, np.nan)
    try:
        p = np.asarray(DISTS[dist]["fit"](x, method), dtype=float)
    except (ValueError, ZeroDivisionError, OverflowError):
        return np.full(k, np.nan)
    if np.isnan(p).any():
        return np.full(k, np.nan)
    return p


def ppf(params, dist: str, q):
    return DISTS[dist]["ppf"](tuple(params), q)


def _rows_eval(kernel, params2d, arg):
    """Evaluate an elementwise distribution kernel across a (n, k) batch of
    parameter rows at once — every kernel in ``DISTS`` is built from
    broadcasting numpy primitives (incl. the array-shape ``gammainc_p`` /
    ``_gamma_ppf_std``), so passing column arrays for ``p`` evaluates all
    rows in one sweep.  Rows with any non-finite parameter yield NaN
    without entering the iterative kernels."""
    P = np.asarray(params2d, dtype=float)
    n = P.shape[0]
    out = np.full(n, np.nan)
    if n == 0:
        return out
    x = np.broadcast_to(np.asarray(arg, dtype=float), (n,))
    ok = np.isfinite(P).all(axis=1) & np.isfinite(x)
    if ok.any():
        cols = tuple(P[ok].T)
        out[ok] = np.asarray(kernel(cols, x[ok]), dtype=float)
    return out


def ppf_rows(params2d, dist: str, q):
    """Row-vectorized ppf over a parameter table: ``params2d`` is (n, k),
    ``q`` a scalar or length-n array; returns length-n values."""
    return _rows_eval(DISTS[dist]["ppf"], params2d, q)


def cdf_rows(params2d, dist: str, x):
    return _rows_eval(DISTS[dist]["cdf"], params2d, x)


def pdf_rows(params2d, dist: str, x):
    fn = DISTS[dist]["pdf"]
    if fn is None:
        raise NotImplementedError(f"pdf not implemented for {dist}")
    return _rows_eval(fn, params2d, x)


def cdf(params, dist: str, x):
    return DISTS[dist]["cdf"](tuple(params), x)


def pdf(params, dist: str, x):
    fn = DISTS[dist]["pdf"]
    if fn is None:
        raise NotImplementedError(f"pdf not implemented for {dist}")
    return fn(tuple(params), x)


# ---------------------------------------------------------------------------
# Regularized incomplete beta + Student-t / F tail probabilities.
# Standard Numerical-Recipes-style continued fraction (Lentz), published
# algorithm; powers the ensemble significance tests (reference
# _robustness.py:519-655 via scipy.stats).
# ---------------------------------------------------------------------------

def _betacf(a: float, b: float, x: float, *, eps: float = 3e-14,
            maxiter: int = 300) -> float:
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, maxiter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b)."""
    x = np.atleast_1d(np.asarray(x, dtype=float))
    out = np.full_like(x, np.nan)
    out[x <= 0] = 0.0
    out[x >= 1] = 1.0
    mid = (x > 0) & (x < 1)
    if mid.any():
        lbeta = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b))
        for i in np.where(mid)[0]:
            xx = float(x[i])
            front = math.exp(lbeta + a * math.log(xx)
                             + b * math.log(1.0 - xx))
            if xx < (a + 1.0) / (a + b + 2.0):
                out[i] = front * _betacf(a, b, xx) / a
            else:
                out[i] = 1.0 - front * _betacf(b, a, 1.0 - xx) / b
    return out


def t_sf_two_sided(t, df) -> np.ndarray:
    """Two-sided Student-t p-value P(|T| > |t|) with ``df`` degrees of
    freedom: I_{df/(df+t^2)}(df/2, 1/2)."""
    t = np.atleast_1d(np.asarray(t, dtype=float))
    df = np.broadcast_to(np.asarray(df, dtype=float), t.shape)
    out = np.full_like(t, np.nan)
    for i in range(t.size):
        if not (np.isfinite(t.flat[i]) and df.flat[i] > 0):
            continue
        x = df.flat[i] / (df.flat[i] + t.flat[i] ** 2)
        out.flat[i] = float(betainc(df.flat[i] / 2.0, 0.5, x)[0])
    return out


def f_sf(f, d1, d2) -> np.ndarray:
    """F-distribution tail P(F > f) = I_{d2/(d2+d1*f)}(d2/2, d1/2)."""
    f = np.atleast_1d(np.asarray(f, dtype=float))
    d1 = np.broadcast_to(np.asarray(d1, dtype=float), f.shape)
    d2 = np.broadcast_to(np.asarray(d2, dtype=float), f.shape)
    out = np.full_like(f, np.nan)
    for i in range(f.size):
        fi = f.flat[i]
        if not np.isfinite(fi) or fi < 0:
            continue
        x = d2.flat[i] / (d2.flat[i] + d1.flat[i] * fi)
        out.flat[i] = float(betainc(d2.flat[i] / 2.0, d1.flat[i] / 2.0,
                                    x)[0])
    return out


def norm_sf_two_sided(z) -> np.ndarray:
    """Two-sided normal p-value P(|Z| > |z|)."""
    z = np.abs(np.asarray(z, dtype=float))
    return 2.0 * (1.0 - _norm_cdf(z))
