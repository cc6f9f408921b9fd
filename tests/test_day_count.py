"""Day counts: ISDA 2006 (accrual, num, den) triplets per convention.

Expected triplets verified bit-exact against the reference
(cavour/utils/day_count.py) on randomized date pairs during development.
"""

import pytest

from adrates_tpu.utils import (Date, DayCount, DayCountTypes, FrequencyTypes,
                               LibError)

D1 = Date(15, 6, 2023)
D2 = Date(15, 12, 2023)


def yf(dcc, d1, d2, **kw):
    return DayCount(dcc).year_frac(d1, d2, **kw)


class TestThirty360Bond:
    def test_simple_period(self):
        acc, num, den = yf(DayCountTypes.THIRTY_360_BOND, D1, D2)
        assert (num, den) == (180, 360)
        assert acc == 0.5

    def test_d1_31_clamps(self):
        acc, num, den = yf(DayCountTypes.THIRTY_360_BOND,
                           Date(31, 1, 2024), Date(28, 2, 2024))
        assert num == 28  # d1 31->30: 30*(1) + (28-30) = 28

    def test_d2_31_only_if_d1_30(self):
        acc, num, _ = yf(DayCountTypes.THIRTY_360_BOND,
                         Date(30, 1, 2024), Date(31, 3, 2024))
        assert num == 60
        acc, num, _ = yf(DayCountTypes.THIRTY_360_BOND,
                         Date(15, 1, 2024), Date(31, 3, 2024))
        assert num == 76


class TestThirtyE360:
    def test_both_31_clamp(self):
        acc, num, _ = yf(DayCountTypes.THIRTY_E_360,
                         Date(31, 1, 2024), Date(31, 3, 2024))
        assert num == 60


class TestThirtyE360ISDA:
    def test_feb_eom_clamps(self):
        acc, num, _ = yf(DayCountTypes.THIRTY_E_360_ISDA,
                         Date(29, 2, 2024), Date(31, 3, 2024))
        assert num == 30  # d1 -> 30, d2 -> 30

    def test_termination_feb_not_clamped(self):
        acc1, num1, _ = yf(DayCountTypes.THIRTY_E_360_ISDA,
                           Date(31, 1, 2024), Date(29, 2, 2024))
        acc2, num2, _ = yf(DayCountTypes.THIRTY_E_360_ISDA,
                           Date(31, 1, 2024), Date(29, 2, 2024),
                           is_termination_date=True)
        assert num1 == 30 and num2 == 29


class TestThirtyEPlus360:
    def test_d2_31_rolls_forward(self):
        acc, num, _ = yf(DayCountTypes.THIRTY_E_PLUS_360,
                         Date(15, 1, 2024), Date(31, 3, 2024))
        assert num == 76  # d2 -> 1 Apr: 30*(4-1) + (1-15) = 76


class TestActActISDA:
    def test_same_year(self):
        acc, num, den = yf(DayCountTypes.ACT_ACT_ISDA, D1, D2)
        assert num == 183 and den == 365
        assert acc == pytest.approx(183 / 365, abs=1e-15)

    def test_cross_year_split(self):
        acc, num, den = yf(DayCountTypes.ACT_ACT_ISDA,
                           Date(1, 7, 2023), Date(1, 7, 2024))
        # 184 days in 2023 (/365) + 182 days in 2024 (/366)
        assert acc == pytest.approx(184 / 365 + 182 / 366, abs=1e-15)

    def test_leap_year(self):
        acc, num, den = yf(DayCountTypes.ACT_ACT_ISDA,
                           Date(1, 1, 2024), Date(1, 3, 2024))
        assert num == 60 and den == 366


class TestActActICMA:
    def test_regular_semi(self):
        d1 = Date(15, 1, 2024)
        d2 = Date(15, 4, 2024)
        d3 = Date(15, 7, 2024)
        acc, num, den = yf(DayCountTypes.ACT_ACT_ICMA, d1, d2, dt3=d3,
                           freq_type=FrequencyTypes.SEMI_ANNUAL)
        assert acc == pytest.approx(91 / (2 * 182), abs=1e-15)

    def test_requires_dt3(self):
        with pytest.raises(LibError):
            yf(DayCountTypes.ACT_ACT_ICMA, D1, D2)


class TestActFixedDenominators:
    def test_act_365f(self):
        acc, num, den = yf(DayCountTypes.ACT_365F, D1, D2)
        assert (num, den) == (183, 365)

    def test_act_360(self):
        acc, num, den = yf(DayCountTypes.ACT_360, D1, D2)
        assert (num, den) == (183, 360)

    def test_simple(self):
        acc, num, den = yf(DayCountTypes.SIMPLE, D1, D2)
        assert den == 365.0


class TestAct365L:
    def test_non_leap_annual(self):
        acc, num, den = yf(DayCountTypes.ACT_365L,
                           Date(15, 6, 2022), Date(15, 6, 2023),
                           dt3=Date(15, 6, 2023),
                           freq_type=FrequencyTypes.ANNUAL)
        assert den == 365

    def test_leap_day_in_period_annual(self):
        acc, num, den = yf(DayCountTypes.ACT_365L,
                           Date(15, 6, 2023), Date(15, 6, 2024),
                           dt3=Date(15, 6, 2024),
                           freq_type=FrequencyTypes.ANNUAL)
        assert den == 366

    def test_semi_annual_leap_target(self):
        acc, num, den = yf(DayCountTypes.ACT_365L,
                           Date(15, 9, 2023), Date(15, 3, 2024),
                           dt3=Date(15, 3, 2024),
                           freq_type=FrequencyTypes.SEMI_ANNUAL)
        assert den == 366


class TestDaysInYear:
    def test_fixed(self):
        assert DayCount(DayCountTypes.ACT_360).days_in_year() == 360
        assert DayCount(DayCountTypes.ACT_365F).days_in_year() == 365
        assert DayCount(DayCountTypes.THIRTY_E_360).days_in_year() == 360

    def test_date_dependent_raises(self):
        for dcc in (DayCountTypes.ACT_ACT_ISDA, DayCountTypes.ACT_ACT_ICMA,
                    DayCountTypes.ACT_365L):
            with pytest.raises(LibError):
                DayCount(dcc).days_in_year()


class TestZero:
    def test_zero_same_as_actact(self):
        a1 = yf(DayCountTypes.ZERO, D1, D2)
        a2 = yf(DayCountTypes.ACT_ACT_ISDA, D1, D2)
        assert a1 == a2
