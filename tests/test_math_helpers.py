"""Math kernels and helpers.

Mirrors the reference's utils/math.py + helpers.py coverage: normal CDF /
inverse, bivariate normal, tridiagonal solve, NPV, tenor labels,
sensitivity conversion, format helpers.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from adrates_tpu.utils import (Date, convert_sensitivities, format_table,
                               label_to_string, times_from_dates, to_tenor)
from adrates_tpu.utils.math import (N, accrued_interpolator, cholesky,
                                    norminvcdf, normpdf, npv, phi2,
                                    solve_tridiagonal)
from adrates_tpu.utils.math import test_monotonicity as is_monotonic
from adrates_tpu.utils.math import test_range as in_range


class TestNormal:
    def test_cdf_matches_scipy(self):
        x = np.linspace(-5, 5, 41)
        np.testing.assert_allclose(np.array(N(jnp.array(x))),
                                   stats.norm.cdf(x), atol=1e-12)

    def test_inverse_roundtrip(self):
        p = np.linspace(0.01, 0.99, 21)
        x = np.array(norminvcdf(jnp.array(p)))
        np.testing.assert_allclose(np.array(N(jnp.array(x))), p,
                                   atol=1e-10)

    def test_pdf(self):
        assert float(normpdf(0.0)) == pytest.approx(
            1 / np.sqrt(2 * np.pi), abs=1e-12)

    def test_bivariate_independent(self):
        # rho=0: phi2(a,b,0) = N(a)*N(b)
        v = float(phi2(0.5, -0.3, 0.0))
        expected = stats.norm.cdf(0.5) * stats.norm.cdf(-0.3)
        assert v == pytest.approx(expected, abs=1e-8)

    def test_bivariate_perfect_correlation(self):
        # rho->1: phi2(a,b,1) = N(min(a,b))
        v = float(phi2(0.5, -0.3, 0.999999))
        assert v == pytest.approx(stats.norm.cdf(-0.3), abs=1e-3)


class TestLinearAlgebra:
    def test_cholesky(self):
        a = np.array([[4.0, 2.0], [2.0, 3.0]])
        c = np.array(cholesky(jnp.array(a)))
        np.testing.assert_allclose(c @ c.T, a, atol=1e-12)

    def test_tridiagonal_vs_dense(self):
        rng = np.random.default_rng(3)
        n = 17
        lo = rng.normal(size=n)
        up = rng.normal(size=n)
        di = 5.0 + rng.random(n)
        rhs = rng.normal(size=n)
        A = np.diag(di) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
        x = np.array(solve_tridiagonal(jnp.array(lo), jnp.array(di),
                                       jnp.array(up), jnp.array(rhs)))
        np.testing.assert_allclose(x, np.linalg.solve(A, rhs), atol=1e-12)


class TestFinancialMath:
    def test_npv(self):
        v = float(npv(jnp.array([1.0, 2.0]), jnp.array([100.0, 100.0]),
                      0.05))
        expected = 100 * np.exp(-0.05) + 100 * np.exp(-0.1)
        assert v == pytest.approx(expected, abs=1e-10)

    def test_accrued_interpolator(self):
        t = jnp.array([0.25])
        out = float(accrued_interpolator(t, jnp.array([0.0, 0.5, 1.0]),
                                         jnp.array([0.0, 10.0, 10.0]))[0])
        assert out == pytest.approx(5.0)

    def test_monotonicity(self):
        assert is_monotonic(jnp.array([1.0, 2.0, 3.0]))
        assert not is_monotonic(jnp.array([1.0, 3.0, 2.0]))

    def test_range(self):
        assert in_range(jnp.array([0.2, 0.8]), 0.0, 1.0)
        assert not in_range(jnp.array([-0.1]), 0.0, 1.0)


class TestTenorLabels:
    @pytest.mark.parametrize("val,expected", [
        (0.02, "2W"), (0.25, "3M"), (0.5, "6M"), (1.0, "1Y"),
        (1.5, "1Y6M"), (10.0, "10Y"), (10.02, "10Y"),
    ])
    def test_to_tenor(self, val, expected):
        assert to_tenor(val) == expected

    def test_list(self):
        assert to_tenor([0.25, 1.0]) == ["3M", "1Y"]


class TestTimesFromDates:
    def test_scalar(self):
        t = times_from_dates(Date(1, 1, 2025), Date(1, 1, 2024))
        assert t == pytest.approx(366 / 365)

    def test_vector(self):
        ts = times_from_dates([Date(1, 7, 2024), Date(1, 1, 2025)],
                              Date(1, 1, 2024))
        assert ts.shape == (2,)

    def test_with_day_count(self):
        from adrates_tpu.utils import DayCountTypes
        t = times_from_dates(Date(1, 1, 2025), Date(1, 1, 2024),
                             DayCountTypes.ACT_360)
        assert t == pytest.approx(366 / 360)


class TestSensitivityConversion:
    def test_df_to_zero_sens(self):
        times = np.array([1.0, 2.0])
        dfs = np.exp(-0.04 * times)
        df_sens = np.array([100.0, 200.0])
        out = convert_sensitivities(df_sens, times, dfs)
        np.testing.assert_allclose(out, df_sens * (-times) * dfs)


class TestFormatting:
    def test_label_to_string(self):
        s = label_to_string("LABEL", 42)
        assert "LABEL" in s and "42" in s

    def test_format_table(self):
        t = format_table(["A", "B"], [[1, 2], [3, 4]])
        assert "A" in t and "4" in t
        assert t.count("+") >= 4
