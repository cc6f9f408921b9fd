"""Reference API-surface parity: reporting helpers, result mixins, and
single-measure engine wrappers that round out the drop-in surface
(reference engine.py:2150-2243, results_base.py:247-376, product
print_payments/print_valuation methods)."""

import numpy as np
import pytest

from adrates_tpu.market.curves.interpolator import Interpolator
from adrates_tpu.market.position.engine import Engine
from adrates_tpu.models import Model
from adrates_tpu.requests.results import CrossGamma
from adrates_tpu.requests.results_base import ValidationMixin
from adrates_tpu.trades.cashflows import SingleFixedCashflow
from adrates_tpu.trades.credit import FRN, Bond
from adrates_tpu.trades.rates import (OIS, YoYInflationSwap,
                                      ZeroCouponInflationSwap)
from adrates_tpu.utils import (CurrencyTypes, CurveTypes, Date,
                               DayCountTypes, FrequencyTypes, InterpTypes,
                               RequestTypes, SwapTypes)

VALUE_DT = Date(1, 1, 2024)


@pytest.fixture(scope="module")
def model():
    m = Model(VALUE_DT)
    m.build_curve("GBP_OIS_SONIA",
                  px_list=[5.0, 4.7, 4.3, 3.9, 3.87, 3.7],
                  tenor_list=["6M", "1Y", "2Y", "5Y", "10Y", "30Y"],
                  fixed_dcc_type=DayCountTypes.ACT_365F,
                  float_dc_type=DayCountTypes.ACT_365F)
    return m


@pytest.fixture(scope="module")
def inflation(model):
    curve, index = model.build_inflation_curve(
        "GBP_RPI", breakeven_list=[3.5, 3.4, 3.3],
        tenor_list=["1Y", "2Y", "5Y"], base_cpi=124.0)
    return curve, index


class TestPrintHelpers:
    """Every product prints payment + valuation tables like the
    reference's PrettyTable reports."""

    def test_zcis_prints(self, model, inflation, capsys):
        curve = model.curves.GBP_OIS_SONIA
        icurve, idx = inflation
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY,
                                    0.033, idx)
        z.value(VALUE_DT, curve, icurve)
        z.print_payments()
        z.print_valuation()
        out = capsys.readouterr().out
        assert "INFLATION LEG" in out and "ZERO-COUPON" in out
        assert "PAY_dt" in out

    def test_zcis_requires_value_first(self, inflation):
        _, idx = inflation
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY,
                                    0.033, idx)
        from adrates_tpu.utils.error import LibError
        with pytest.raises(LibError):
            z.print_valuation()

    def test_yoy_prints(self, model, inflation, capsys):
        curve = model.curves.GBP_OIS_SONIA
        icurve, idx = inflation
        y = YoYInflationSwap(VALUE_DT, "3Y", SwapTypes.PAY, 0.032, idx,
                             FrequencyTypes.ANNUAL)
        y.value(VALUE_DT, curve, icurve)
        y.print_payments()
        y.print_valuation()
        out = capsys.readouterr().out
        assert "YOY_RATE" in out and "CUM_PV" in out

    def test_bond_print_valuation(self, model, capsys):
        curve = model.curves.GBP_OIS_SONIA
        b = Bond(VALUE_DT, "5Y", 0.04, FrequencyTypes.SEMI_ANNUAL,
                 DayCountTypes.ACT_365F, CurrencyTypes.GBP)
        b.print_valuation(VALUE_DT, curve)
        out = capsys.readouterr().out
        assert "CLEAN PRICE" in out and "DIRTY PRICE" in out
        # the printed cumulative PV ends at the bond PV
        assert "CUM_PV" in out

    def test_frn_print_valuation(self, model, capsys):
        curve = model.curves.GBP_OIS_SONIA
        f = FRN(VALUE_DT, "3Y", 0.002, FrequencyTypes.QUARTERLY,
                DayCountTypes.ACT_365F, CurveTypes.GBP_OIS_SONIA,
                CurrencyTypes.GBP)
        f.value(VALUE_DT, curve)
        f.print_valuation()
        out = capsys.readouterr().out
        assert "RATE" in out and "CUM_PV" in out

    def test_single_cashflow_print(self, model, capsys):
        curve = model.curves.GBP_OIS_SONIA
        cf = SingleFixedCashflow(Date(1, 7, 2026), 1e6, CurrencyTypes.GBP)
        cf.print_valuation(VALUE_DT, curve)
        out = capsys.readouterr().out
        assert "AMOUNT" in out and "DF" in out


class TestEngineWrappers:
    """Single-measure valuation/delta/gamma entry points route through
    compute (reference engine.py:2150-2243)."""

    def test_wrappers_match_compute(self, model):
        swap = OIS(VALUE_DT, "10Y", SwapTypes.RECEIVE, 0.0387,
                   FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
                   CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                   notional=1e7, float_dc_type=DayCountTypes.ACT_365F)
        e = Engine(model)
        res = e.compute(swap, [RequestTypes.VALUE, RequestTypes.DELTA,
                               RequestTypes.GAMMA])
        assert e.valuation(swap).amount == pytest.approx(
            res.value.amount, abs=1e-9)
        np.testing.assert_allclose(
            e.delta(swap)(CurveTypes.GBP_OIS_SONIA).risk_ladder,
            res.risk(CurveTypes.GBP_OIS_SONIA).risk_ladder, rtol=1e-12)
        np.testing.assert_allclose(
            e.gamma(swap).risk_matrix, res.gamma.risk_matrix, rtol=1e-12)


class TestResultMixins:

    def test_validators(self):
        ValidationMixin.validate_shape_match(np.zeros(3),
                                             ["1Y", "2Y", "3Y"])
        with pytest.raises(ValueError):
            ValidationMixin.validate_shape_match(np.zeros(2),
                                                 ["1Y", "2Y", "3Y"])
        ValidationMixin.validate_currency_match(CurrencyTypes.GBP,
                                                CurrencyTypes.GBP)
        with pytest.raises(ValueError):
            ValidationMixin.validate_currency_match(CurrencyTypes.GBP,
                                                    CurrencyTypes.USD)

    def test_cashflows_sum_aggregate(self, model):
        swap = OIS(VALUE_DT, "5Y", SwapTypes.RECEIVE, 0.039,
                   FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
                   CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                   notional=1e7, float_dc_type=DayCountTypes.ACT_365F)
        res = Engine(model).compute(swap, [RequestTypes.CASHFLOWS])
        cfs = res.cashflows
        assert cfs.sum().amount == pytest.approx(cfs.total_pv)
        assert cfs.aggregate(len) == len(cfs._items)
        assert isinstance(cfs.summary(), str) and cfs.summary()

    def test_crossgamma_exports(self, tmp_path):
        cg = CrossGamma(np.arange(6.0).reshape(2, 3), ["1Y", "2Y"],
                        ["1Y", "5Y", "10Y"], CurrencyTypes.GBP,
                        CurveTypes.GBP_OIS_SONIA, CurveTypes.USD_OIS_SOFR)
        csv = cg.to_csv()
        assert "5Y" in csv and "10Y" in csv
        p = tmp_path / "cg.csv"
        cg.to_csv(str(p))
        assert p.read_text() == csv


class TestInterpolatorCompat:

    def test_simple_interpolate_on_base_class(self):
        times = np.array([0.5, 1.0, 2.0])
        dfs = np.array([0.99, 0.97, 0.93])
        it = Interpolator(InterpTypes.LINEAR_ZERO_RATES)
        out = float(np.asarray(it.simple_interpolate(
            1.5, times, dfs, InterpTypes.LINEAR_ZERO_RATES.value)))
        # linear in zero rates between the knots
        z1, z2 = -np.log(0.97) / 1.0, -np.log(0.93) / 2.0
        z = z1 + (z2 - z1) * 0.5
        assert out == pytest.approx(np.exp(-z * 1.5), rel=1e-12)
