"""Robustness: clean LibErrors on bad inputs, edge dates, tiny/huge values.

Mirrors the reference's test_error_handling.py (30 tests).
"""

import numpy as np
import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, Calendar, CalendarTypes,
                               CurrencyTypes, CurveTypes, Date, DayCount,
                               DayCountTypes, FrequencyTypes, InterpTypes,
                               LibError, RequestTypes, Schedule, SwapTypes)
from adrates_tpu.models import Model
from adrates_tpu.requests.results import Delta, Gamma, Risk, Valuation
from adrates_tpu.trades.rates import OIS, OISCurve

VALUE_DT = Date(1, 1, 2024)


def make_swap(tenor="5Y", coupon=0.04, notional=1e6):
    return OIS(VALUE_DT, tenor, SwapTypes.PAY, coupon,
               FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
               CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
               notional=notional, float_dc_type=DayCountTypes.ACT_365F)


class TestDateErrors:
    def test_bad_day(self):
        with pytest.raises(LibError):
            Date(31, 4, 2024)

    def test_bad_month(self):
        with pytest.raises(LibError):
            Date(1, 13, 2024)

    def test_pre_1900(self):
        with pytest.raises(LibError):
            Date(1, 1, 1850)

    def test_bad_hours(self):
        with pytest.raises(LibError):
            Date(1, 1, 2024, hh=25)

    def test_weekdays_non_int(self):
        with pytest.raises(LibError):
            Date(1, 1, 2024).add_weekdays(1.5)

    def test_add_months_fractional(self):
        with pytest.raises(LibError):
            Date(1, 1, 2024).add_months(1.5)


class TestCalendarErrors:
    def test_bad_adjust_type(self):
        with pytest.raises(LibError):
            Calendar(CalendarTypes.WEEKEND).adjust(VALUE_DT, "FOLLOWING")

    def test_bad_calendar_type(self):
        with pytest.raises(LibError):
            Calendar("UNITED_KINGDOM")

    def test_business_days_non_int(self):
        with pytest.raises(LibError):
            Calendar(CalendarTypes.WEEKEND).add_business_days(VALUE_DT,
                                                              2.5)


class TestDayCountErrors:
    def test_bad_type(self):
        with pytest.raises(LibError):
            DayCount("ACT_360")

    def test_icma_requires_period(self):
        with pytest.raises(LibError):
            DayCount(DayCountTypes.ACT_ACT_ICMA).year_frac(
                VALUE_DT, VALUE_DT.add_tenor("6M"))


class TestScheduleErrors:
    def test_backwards_dates(self):
        with pytest.raises(LibError):
            Schedule(VALUE_DT, Date(1, 1, 2020))

    def test_equal_dates(self):
        with pytest.raises(LibError):
            Schedule(VALUE_DT, VALUE_DT)


class TestCurveErrors:
    def test_unsorted_pillars(self):
        swaps = [make_swap("5Y"), make_swap("2Y")]
        with pytest.raises(LibError):
            OISCurve(VALUE_DT, swaps, InterpTypes.LINEAR_ZERO_RATES)

    def test_unknown_curve_name(self):
        m = Model(VALUE_DT)
        with pytest.raises(KeyError):
            m.build_curve("NOT_A_CURVE", px_list=[4.0],
                          tenor_list=["1Y"])

    def test_scenario_unknown_curve(self):
        m = Model(VALUE_DT)
        with pytest.raises(LibError):
            m.scenario("GBP_OIS_SONIA", 0.1)

    def test_missing_curve_access(self):
        m = Model(VALUE_DT)
        with pytest.raises(AttributeError):
            m.curves.GBP_OIS_SONIA


class TestResultErrors:
    def test_currency_mismatch_add(self):
        v1 = Valuation(100.0, CurrencyTypes.GBP)
        v2 = Valuation(100.0, CurrencyTypes.USD)
        with pytest.raises(ValueError):
            v1 + v2

    def test_delta_tenor_mismatch(self):
        d1 = Delta([1.0, 2.0], ["1Y", "2Y"], CurrencyTypes.GBP,
                   CurveTypes.GBP_OIS_SONIA)
        d2 = Delta([1.0, 2.0], ["1Y", "5Y"], CurrencyTypes.GBP,
                   CurveTypes.GBP_OIS_SONIA)
        with pytest.raises(ValueError):
            d1 + d2

    def test_delta_length_mismatch(self):
        with pytest.raises(ValueError):
            Delta([1.0, 2.0], ["1Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)

    def test_bad_currency_type(self):
        with pytest.raises(TypeError):
            Valuation(100.0, "GBP")

    def test_duplicate_curve_in_risk(self):
        d = Delta([1.0], ["1Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        with pytest.raises(ValueError):
            Risk([d, d])

    def test_risk_unknown_curve_lookup(self):
        d = Delta([1.0], ["1Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        risk = Risk([d])
        with pytest.raises(ValueError):
            risk(CurveTypes.USD_OIS_SOFR)


class TestExtremeValues:
    @pytest.fixture(scope="class")
    def model(self):
        m = Model(VALUE_DT)
        m.build_curve("GBP_OIS_SONIA",
                      px_list=[5.0, 4.7, 4.3, 3.9],
                      tenor_list=["6M", "1Y", "5Y", "10Y"],
                      fixed_dcc_type=DayCountTypes.ACT_365F,
                      float_dc_type=DayCountTypes.ACT_365F)
        return m

    def test_tiny_notional(self, model):
        s = make_swap(notional=0.01)
        res = s.position(model).compute([RequestTypes.VALUE])
        assert np.isfinite(res.value.amount)

    def test_huge_notional(self, model):
        s = make_swap(notional=1e12)
        res = s.position(model).compute([RequestTypes.VALUE])
        assert np.isfinite(res.value.amount)

    def test_zero_coupon_swap(self, model):
        s = make_swap(coupon=0.0)
        res = s.position(model).compute([RequestTypes.VALUE,
                                         RequestTypes.DELTA])
        assert np.isfinite(res.value.amount)
        assert np.all(np.isfinite(res.risk.risk_ladder))

    def test_negative_coupon(self, model):
        s = make_swap(coupon=-0.01)
        res = s.position(model).compute([RequestTypes.VALUE])
        assert np.isfinite(res.value.amount)

    def test_short_tenor(self, model):
        s = make_swap(tenor="1M")
        res = s.position(model).compute([RequestTypes.VALUE])
        assert np.isfinite(res.value.amount)

    def test_very_long_tenor(self, model):
        s = make_swap(tenor="50Y")
        res = s.position(model).compute([RequestTypes.VALUE,
                                         RequestTypes.DELTA])
        assert np.isfinite(res.value.amount)

    def test_negative_rates_curve(self):
        """Negative-rate environments must bootstrap and reprice."""
        m = Model(VALUE_DT)
        m.build_curve("EUR_OIS_ESTR",
                      px_list=[-0.5, -0.4, -0.2, 0.1],
                      tenor_list=["6M", "1Y", "5Y", "10Y"],
                      fixed_dcc_type=DayCountTypes.ACT_360,
                      float_dc_type=DayCountTypes.ACT_360,
                      interp_type=InterpTypes.FLAT_FWD_RATES)
        curve = m.curves.EUR_OIS_ESTR
        dfs = np.array(curve._dfs)
        assert np.all(np.isfinite(dfs))
        assert dfs[1] > 1.0  # negative short rates -> DFs above par
