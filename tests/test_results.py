"""Result containers: arithmetic, exports, filters, validation.

Mirrors the reference's results.py/results_base.py coverage: typed
arithmetic (+, scaling), to_json/to_csv/DataFrame views, cashflow filters,
NaN/Inf validators.
"""

import json

import numpy as np
import pytest

from adrates_tpu.utils import CurrencyTypes, CurveTypes, Date
from adrates_tpu.requests.results import (AnalyticsResult, CashflowItem,
                                          Cashflows, CrossGamma, Delta,
                                          Gamma, Ladder, Risk, Valuation,
                                          Value)
from adrates_tpu.requests.results_base import ValidationMixin


class TestValuation:
    def test_arithmetic(self):
        v = Valuation(100.0, CurrencyTypes.GBP)
        assert (v + v).amount == 200.0
        assert (v - v).amount == 0.0
        assert (2 * v).amount == 200.0
        assert (v / 4).amount == 25.0

    def test_sum_builtin(self):
        vs = [Valuation(1.0, CurrencyTypes.GBP)] * 3
        assert sum(vs).amount == 3.0

    def test_json_roundtrip(self):
        v = Valuation(123.45, CurrencyTypes.USD)
        d = json.loads(v.to_json())
        assert d == {"amount": 123.45, "currency": "USD"}

    def test_csv(self):
        assert "amount" in Valuation(1.0, CurrencyTypes.GBP).to_csv()

    def test_repr(self):
        assert "GBP" in repr(Valuation(1.0, CurrencyTypes.GBP))


class TestDelta:
    def test_value_and_ladder(self):
        d = Delta([10.0, -5.0], ["1Y", "5Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        assert d.value.amount == 5.0
        assert d.ladder.to_dict() == {"1Y": 10.0, "5Y": -5.0}
        df = d.df
        assert list(df.index) == ["1Y", "5Y"]

    def test_add(self):
        d = Delta([1.0, 2.0], ["1Y", "5Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        s = d + d
        np.testing.assert_allclose(s.risk_ladder, [2.0, 4.0])

    def test_json(self):
        d = Delta([1.0], ["1Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        out = json.loads(d.to_json())
        assert out["curve_type"] == "GBP_OIS_SONIA"
        assert out["total"] == 1.0


class TestGamma:
    def test_matrix_view(self):
        g = Gamma(np.array([[1.0, 0.1], [0.1, 2.0]]), ["1Y", "5Y"],
                  CurrencyTypes.GBP, CurveTypes.GBP_OIS_SONIA)
        m = g.matrix
        assert m["1Y"]["5Y"] == 0.1
        assert g.value.amount == pytest.approx(3.2)

    def test_vector_gamma_diagonalized(self):
        g = Gamma(np.array([1.0, 2.0]), ["1Y", "5Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        assert g.matrix["1Y"]["5Y"] == 0.0
        assert g.df.values[1, 1] == 2.0

    def test_add(self):
        g = Gamma(np.eye(2), ["1Y", "5Y"], CurrencyTypes.GBP,
                  CurveTypes.GBP_OIS_SONIA)
        s = g + g
        np.testing.assert_allclose(s.risk_ladder, 2 * np.eye(2))


class TestCrossGamma:
    def test_shape_check(self):
        with pytest.raises(ValueError):
            CrossGamma(np.zeros((2, 3)), ["1Y"], ["1Y", "5Y", "10Y"],
                       CurrencyTypes.GBP, CurveTypes.GBP_OIS_SONIA,
                       CurveTypes.USD_GBP_BASIS)

    def test_matrix(self):
        cg = CrossGamma(np.arange(6.0).reshape(2, 3), ["1Y", "5Y"],
                        ["2Y", "5Y", "10Y"], CurrencyTypes.GBP,
                        CurveTypes.GBP_OIS_SONIA, CurveTypes.USD_GBP_BASIS)
        assert cg.matrix["5Y"]["10Y"] == 5.0
        assert cg.value.amount == 15.0


class TestRisk:
    def test_attribute_and_call_access(self):
        d1 = Delta([1.0], ["1Y"], CurrencyTypes.GBP,
                   CurveTypes.GBP_OIS_SONIA)
        d2 = Delta([2.0], ["1Y"], CurrencyTypes.USD,
                   CurveTypes.USD_OIS_SOFR)
        risk = Risk([d1, d2])
        assert risk.GBP_OIS_SONIA is d1
        assert risk(CurveTypes.USD_OIS_SOFR) is d2

    def test_cross_gamma_registry(self):
        cg = CrossGamma(np.zeros((1, 1)), ["1Y"], ["1Y"],
                        CurrencyTypes.GBP, CurveTypes.GBP_OIS_SONIA,
                        CurveTypes.USD_GBP_BASIS)
        risk = Risk([], cross_gammas=[cg])
        assert risk.has_cross_gamma(CurveTypes.GBP_OIS_SONIA,
                                    CurveTypes.USD_GBP_BASIS)
        assert risk.cross_gamma(CurveTypes.USD_OIS_SOFR,
                                CurveTypes.USD_GBP_BASIS) is None


class TestCashflows:
    def make(self):
        items = [
            CashflowItem(Date(1, 7, 2024), 1e6, 0.04, 0.5, 20000.0, 0.98,
                         19600.0, "Fixed_Pay"),
            CashflowItem(Date(1, 7, 2024), 1e6, 0.05, 0.5, 25000.0, 0.98,
                         24500.0, "Float_Rec"),
            CashflowItem(Date(1, 7, 2029), 1e6, 1.0, 0.0, 1e6, 0.8, 8e5,
                         "Notional_Rec"),
        ]
        return Cashflows(items, CurrencyTypes.GBP)

    def test_filters(self):
        cfs = self.make()
        assert len(cfs.fixed) == 1
        assert len(cfs.floating) == 1
        assert len(cfs.notional_exchange) == 1
        assert len(cfs.pay) == 1
        assert len(cfs.receive) == 2

    def test_totals(self):
        cfs = self.make()
        assert cfs.total_pv == pytest.approx(19600 + 24500 + 8e5)
        assert cfs.sum().currency == CurrencyTypes.GBP

    def test_df_view(self):
        df = self.make().df
        assert len(df) == 3
        assert "discounted_amount" in df.columns

    def test_validation(self):
        cfs = self.make()
        assert cfs.validate()


class TestValidationMixin:
    def test_nan_detected(self):
        with pytest.raises(ValueError):
            ValidationMixin.validate_no_nan([1.0, np.nan])

    def test_inf_detected(self):
        with pytest.raises(ValueError):
            ValidationMixin.validate_no_inf([np.inf])

    def test_shape(self):
        with pytest.raises(ValueError):
            ValidationMixin.validate_shape(np.zeros((2, 2)), (2, 3))

    def test_square(self):
        with pytest.raises(ValueError):
            ValidationMixin.validate_square(np.zeros((2, 3)))


class TestAnalyticsResult:
    def test_repr_and_properties(self):
        v = Valuation(1.0, CurrencyTypes.GBP)
        res = AnalyticsResult(value=v)
        assert res.value is v
        assert res.risk is None
        assert "value" in repr(res)
