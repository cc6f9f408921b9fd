"""Numerical kernels: normal distribution, solvers, NPV.

TPU-native replacements for the reference's numba kernels
(/root/reference/cavour/utils/math.py: N at 317, norminvcdf at 519,
phi2/M at 592-599, phi3 at 481, cholesky at 674, tridiagonal at 734,
npv at 700, accrued_interpolator at 66). Everything here is expressed in
jax.numpy so it JITs onto the TPU VPU and is differentiable; scalar numpy
fallbacks are unnecessary because jnp handles both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .error import LibError
from .global_vars import gSmall

PI = 3.14159265358979323846
INVROOT2PI = 0.3989422804014327


def normpdf(x):
    """Standard normal density."""
    x = jnp.asarray(x)
    return jnp.exp(-x * x / 2.0) * INVROOT2PI


def N(x):
    """Standard normal CDF (erf-based; matches the reference's Hull
    approximation to ~1e-7 and is exact where it matters)."""
    x = jnp.asarray(x)
    return 0.5 * (1.0 + jax.scipy.special.erf(x / jnp.sqrt(2.0)))


def normcdf(x):
    return N(x)


def norminvcdf(p):
    """Inverse standard normal CDF."""
    p = jnp.asarray(p)
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * p - 1.0)


def phi2(h1, hk, r):
    """Bivariate standard normal CDF P(X<h1, Y<hk) with correlation r.

    Drezner-Wesolowsky style Gauss-Legendre quadrature (differentiable).
    """
    h1 = jnp.asarray(h1, dtype=jnp.float64)
    hk = jnp.asarray(hk, dtype=jnp.float64)
    r = jnp.clip(jnp.asarray(r, dtype=jnp.float64), -1.0 + 1e-12,
                 1.0 - 1e-12)
    # 20-point Gauss-Legendre on [0, r]
    nodes, weights = _gauss_legendre_20()
    t = 0.5 * (nodes + 1.0)  # [0,1]
    rho = r * t
    denom = jnp.sqrt(1.0 - rho ** 2)
    integrand = jnp.exp(-(h1 ** 2 - 2.0 * rho * h1 * hk + hk ** 2)
                        / (2.0 * denom ** 2)) / denom
    integral = 0.5 * r * jnp.sum(weights * integrand) / (2.0 * PI)
    return N(h1) * N(hk) + integral


def M(a, b, c):
    """Alias used by the reference for the bivariate CDF."""
    return phi2(a, b, c)


def _gauss_legendre_20():
    import numpy as _np
    nodes, weights = _np.polynomial.legendre.leggauss(20)
    return jnp.array(nodes), jnp.array(weights)


def phi3(b1, b2, b3, r12, r13, r23, n_quad: int = 40):
    """Trivariate standard normal CDF via conditioning quadrature on X3."""
    nodes, weights = map(jnp.asarray, _gauss_hermite(n_quad))
    x = jnp.sqrt(2.0) * nodes
    w = weights / jnp.sqrt(PI)
    mask = x < b3
    d1 = jnp.sqrt(jnp.maximum(1.0 - r13 ** 2, gSmall))
    d2 = jnp.sqrt(jnp.maximum(1.0 - r23 ** 2, gSmall))
    a1 = (b1 - r13 * x) / d1
    a2 = (b2 - r23 * x) / d2
    rho_cond = (r12 - r13 * r23) / (d1 * d2)
    vals = jax.vmap(lambda u, v: phi2(u, v, rho_cond))(a1, a2)
    return jnp.sum(jnp.where(mask, w * vals, 0.0))


def _gauss_hermite(n):
    import numpy as _np
    return _np.polynomial.hermite.hermgauss(n)


def cholesky(a):
    """Cholesky factor (lower) — jnp, differentiable."""
    return jnp.linalg.cholesky(jnp.asarray(a))


def solve_tridiagonal(lower, diag, upper, rhs):
    """Tridiagonal solve via parallel cyclic reduction (PCR).

    lower[0] and upper[-1] are ignored. All inputs length n. log2(n)
    whole-vector elimination steps — differentiable, and f64-exact on TPU
    where a scalar Thomas scan would silently run at f32 precision and
    XLA's f64 LU is unimplemented (docs/tpu_f64_notes.md rules 3-4).
    """
    a = jnp.asarray(lower)
    b = jnp.asarray(diag)
    c = jnp.asarray(upper)
    d = jnp.asarray(rhs)
    n = b.shape[0]
    a = a.at[0].set(0.0)
    c = c.at[n - 1].set(0.0)

    import math as _math
    steps = max(1, _math.ceil(_math.log2(n))) if n > 1 else 0

    def shift_up(x, fill=0.0):    # x[i-stride]
        return jnp.concatenate([jnp.full(stride, fill, x.dtype),
                                x[:-stride]])

    def shift_dn(x, fill=0.0):    # x[i+stride]
        return jnp.concatenate([x[stride:],
                                jnp.full(stride, fill, x.dtype)])

    stride = 1
    for _ in range(steps):
        b_up = shift_up(b, 1.0)
        b_dn = shift_dn(b, 1.0)
        alpha = -a / b_up
        gamma = -c / b_dn
        a_new = alpha * shift_up(a)
        b_new = b + alpha * shift_up(c) + gamma * shift_dn(a)
        c_new = gamma * shift_dn(c)
        d_new = d + alpha * shift_up(d) + gamma * shift_dn(d)
        a, b, c, d = a_new, b_new, c_new, d_new
        stride *= 2

    return d / b


def npv(times, amounts, rate):
    """Continuous-compounding NPV of a cashflow strip."""
    times = jnp.asarray(times)
    amounts = jnp.asarray(amounts)
    return jnp.sum(amounts * jnp.exp(-rate * times))


def accrued_interpolator(t, coupon_times, coupon_amounts):
    """Linear accrual between coupon dates (reference math.py:66)."""
    t = jnp.asarray(t)
    coupon_times = jnp.asarray(coupon_times)
    coupon_amounts = jnp.asarray(coupon_amounts)
    idx = jnp.clip(jnp.searchsorted(coupon_times, t, side="right"),
                   1, coupon_times.size - 1)
    t0 = coupon_times[idx - 1]
    t1 = coupon_times[idx]
    c = coupon_amounts[idx]
    return c * (t - t0) / jnp.maximum(t1 - t0, gSmall)


def test_monotonicity(x) -> bool:
    x = jnp.asarray(x)
    return bool(jnp.all(x[1:] > x[:-1]))


def test_range(x, lower, upper) -> bool:
    x = jnp.asarray(x)
    return bool(jnp.all((x >= lower) & (x <= upper)))


def uniform_to_default_time(u, times, survival_probs):
    """Map a uniform draw to a default time by inverting the survival curve
    (reference helpers.py njit kernel semantics)."""
    import numpy as _np
    u = float(u)
    times = _np.asarray(times)
    sp = _np.asarray(survival_probs)
    if u >= sp[-1]:
        idx = _np.searchsorted(sp[::-1], u)
        n = sp.size
        i = n - idx
        if i >= n:
            return float(times[-1])
        s0, s1 = sp[i - 1], sp[i]
        t0, t1 = times[i - 1], times[i]
        return float(t0 + (t1 - t0) * (s0 - u) / max(s0 - s1, 1e-15))
    return 99999.0


def maximum(a, b):
    return jnp.maximum(a, b)


def minimum(a, b):
    return jnp.minimum(a, b)
