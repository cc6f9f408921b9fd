"""Inflation: index fixings/lag/seasonality, ZCIS curve, ZCIS + YoY swaps.

Mirrors the reference's test_zcis.py (10 tests) plus index/curve coverage,
and adds engine AD risk checks (the reference engine has no ZCIS path and
leaves the YoY cross-gamma as zero).
"""

import numpy as np
import pytest

from adrates_tpu.utils import (CurrencyTypes, CurveTypes, Date,
                               DayCountTypes, FrequencyTypes,
                               InflationIndexTypes, InflationInterpTypes,
                               LibError, RequestTypes, SwapTypes)
from adrates_tpu.market.curves import InflationCurve
from adrates_tpu.market.indices import InflationIndex
from adrates_tpu.models import Model
from adrates_tpu.trades.rates import (SwapYoYInflationLeg,
                                      YoYInflationSwap,
                                      ZeroCouponInflationSwap)

VALUE_DT = Date(1, 1, 2024)
BE_TENORS = ["1Y", "2Y", "3Y", "5Y", "10Y", "20Y", "30Y"]
BE_RATES = [3.8, 3.6, 3.5, 3.4, 3.5, 3.45, 3.3]
BASE_CPI = 293.0


@pytest.fixture(scope="module")
def model():
    m = Model(VALUE_DT)
    m.build_curve("GBP_OIS_SONIA",
                  px_list=[5.19, 5.04, 4.71, 4.35, 4.13, 3.93, 3.87, 3.87,
                           3.88, 3.71],
                  tenor_list=["1M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y",
                              "10Y", "20Y", "30Y"],
                  fixed_dcc_type=DayCountTypes.ACT_365F,
                  float_dc_type=DayCountTypes.ACT_365F)
    m.build_inflation_curve("GBP_RPI_INFLATION", breakeven_list=BE_RATES,
                            tenor_list=BE_TENORS, base_cpi=BASE_CPI)
    return m


@pytest.fixture(scope="module")
def infl(model):
    curve = model.curves["GBP_RPI_INFLATION"]
    # the builder attaches the index to the curve via set_inflation_curve
    index = None
    for c in model._curves_dict.values():
        pass
    return curve


@pytest.fixture(scope="module")
def index(model, infl):
    # rebuild handle: the builder returns it, here we find it via any ZCIS
    return infl._used_swaps[0]._inflation_index


class TestInflationIndex:
    def test_base_fixing(self, index):
        assert index.get_index(index._base_date,
                               apply_lag=False) == BASE_CPI

    def test_lag_applied(self, index):
        # value date lagged by 3M = base date -> base fixing
        assert index.get_index(VALUE_DT) == pytest.approx(BASE_CPI)

    def test_fixing_interpolation_linear(self):
        idx = InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                             100.0, CurrencyTypes.GBP, lag_months=0)
        idx.add_fixing(Date(1, 2, 2023), 102.0)
        mid = idx.get_index(Date(16, 1, 2023), apply_lag=False)
        assert 100.0 < mid < 102.0

    def test_fixing_interpolation_flat(self):
        idx = InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                             100.0, CurrencyTypes.GBP, lag_months=0,
                             interp_type=InflationInterpTypes.FLAT)
        idx.add_fixing(Date(1, 2, 2023), 102.0)
        assert idx.get_index(Date(16, 1, 2023), apply_lag=False) == 100.0

    def test_compound_interpolation(self):
        idx = InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                             100.0, CurrencyTypes.GBP, lag_months=0,
                             interp_type=InflationInterpTypes.COMPOUND)
        idx.add_fixing(Date(1, 2, 2023), 102.0)
        v = idx.get_index(Date(16, 1, 2023), apply_lag=False)
        assert 100.0 < v < 102.0

    def test_seasonality_validation(self):
        with pytest.raises(LibError):
            InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                           100.0, CurrencyTypes.GBP,
                           seasonality_factors={1: 1.0})
        bad = {m: 1.1 for m in range(1, 13)}
        with pytest.raises(LibError):
            InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                           100.0, CurrencyTypes.GBP,
                           seasonality_factors=bad)

    def test_no_fixing_no_curve_raises(self):
        idx = InflationIndex(InflationIndexTypes.UK_RPI, Date(1, 1, 2023),
                             100.0, CurrencyTypes.GBP, lag_months=0)
        with pytest.raises(LibError):
            idx.get_index(Date(1, 6, 2030), apply_lag=False)

    def test_inflation_ratio(self, index, infl):
        r = index.inflation_ratio(VALUE_DT, VALUE_DT.add_tenor("5Y"))
        assert r > 1.1  # ~3.4% over ~5y


class TestInflationCurve:
    def test_refit_breakevens(self, infl):
        """Pillar factors imply the quoted breakevens to 1e-10."""
        for i, (t, be) in enumerate(zip(infl.swap_times,
                                        [r / 100 for r in BE_RATES])):
            factor = float(infl._dfs[i + 1])
            implied = factor ** (1.0 / t) - 1.0
            assert implied == pytest.approx(be, abs=1e-10)

    def test_factors_increasing(self, infl):
        factors = np.array(infl._dfs)
        assert np.all(np.diff(factors) > 0)

    def test_forward_index(self, infl):
        cpi5 = infl.forward_index(VALUE_DT.add_tenor("5Y"))
        assert cpi5 == pytest.approx(BASE_CPI * 1.034 ** 5, rel=1e-3)

    def test_forward_rate_5y5y(self, infl):
        r = infl.inflation_rate(VALUE_DT.add_tenor("5Y"),
                                VALUE_DT.add_tenor("10Y"))
        assert 0.03 < r < 0.04

    def test_backdated_projection_raises(self, infl):
        with pytest.raises(LibError):
            infl.forward_index(Date(1, 1, 2020))

    def test_needs_two_instruments(self, infl):
        with pytest.raises(LibError):
            InflationCurve(VALUE_DT, infl._used_swaps[:1], BASE_CPI,
                           CurrencyTypes.GBP, InflationIndexTypes.UK_RPI)


class TestZCIS:
    def test_par_at_curve_breakeven(self, model, infl, index):
        ois = model.curves.GBP_OIS_SONIA
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.034,
                                    index, notional=1_000_000)
        be = z.breakeven_inflation_rate(VALUE_DT, ois, infl)
        z_par = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, be,
                                        index, notional=1_000_000)
        assert z_par.value(VALUE_DT, ois, infl) == pytest.approx(0.0,
                                                                 abs=1e-4)

    def test_pay_receive_mirror(self, model, infl, index):
        ois = model.curves.GBP_OIS_SONIA
        pay = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.03,
                                      index)
        rec = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.RECEIVE,
                                      0.03, index)
        assert pay.value(VALUE_DT, ois, infl) == pytest.approx(
            -rec.value(VALUE_DT, ois, infl), abs=1e-8)

    def test_higher_fixed_rate_lowers_payer_value(self, model, infl,
                                                  index):
        ois = model.curves.GBP_OIS_SONIA
        lo = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.02,
                                     index)
        hi = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.05,
                                     index)
        assert lo.value(VALUE_DT, ois, infl) > hi.value(VALUE_DT, ois,
                                                        infl)

    def test_pv01_positive(self, model, index):
        ois = model.curves.GBP_OIS_SONIA
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.034,
                                    index)
        assert z.pv01(VALUE_DT, ois) > 0

    def test_engine_equals_direct(self, model, infl, index):
        ois = model.curves.GBP_OIS_SONIA
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.035,
                                    index, notional=10_000_000)
        direct = z.value(VALUE_DT, ois, infl)
        res = z.position(model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(direct, abs=1e-6)

    def test_engine_risk_structure(self, model, index):
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.035,
                                    index, notional=10_000_000)
        res = z.position(model).compute([RequestTypes.DELTA,
                                         RequestTypes.GAMMA])
        assert res.risk(CurveTypes.GBP_OIS_SONIA) is not None
        assert res.risk(CurveTypes.GBP_RPI_INFLATION) is not None
        g = res.gamma(CurveTypes.GBP_RPI_INFLATION).risk_ladder
        np.testing.assert_allclose(g, g.T, rtol=1e-8, atol=1e-12)
        assert res.gamma.cross_gamma(CurveTypes.GBP_OIS_SONIA,
                                     CurveTypes.GBP_RPI_INFLATION) \
            is not None

    def test_breakeven_delta_concentrated(self, model, index):
        """A 5Y ZCIS's breakeven delta sits on the 3Y/5Y pillars."""
        z = ZeroCouponInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.035,
                                    index, notional=10_000_000)
        res = z.position(model).compute([RequestTypes.DELTA])
        lad = np.abs(res.risk(CurveTypes.GBP_RPI_INFLATION).risk_ladder)
        assert np.argmax(lad) in (2, 3)  # 3Y or 5Y bucket (lagged window)


class TestYoY:
    @pytest.fixture(scope="class")
    def yoy(self, index):
        return YoYInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.034,
                                index, FrequencyTypes.ANNUAL,
                                notional=10_000_000)

    def test_leg_schedule(self, yoy):
        leg = yoy._inflation_leg
        assert len(leg._payment_dts) == 5
        for s, e in zip(leg._yoy_start_dts, leg._yoy_end_dts):
            assert (e - s) == pytest.approx(365, abs=2)

    def test_breakeven_par(self, model, infl, yoy, index):
        ois = model.curves.GBP_OIS_SONIA
        be = yoy.breakeven_rate(VALUE_DT, ois, infl)
        par = YoYInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, be, index,
                               FrequencyTypes.ANNUAL, notional=10_000_000)
        assert par.value(VALUE_DT, ois, infl) == pytest.approx(0.0,
                                                               abs=1e-4)

    def test_pv01(self, model, yoy):
        ois = model.curves.GBP_OIS_SONIA
        pv01 = yoy.pv01(VALUE_DT, ois)
        # ~5y annuity on 10M = ~4.4 per bp x 10M / 1e4
        assert 3000 < pv01 < 5000

    def test_engine_equals_direct(self, model, infl, yoy):
        ois = model.curves.GBP_OIS_SONIA
        direct = yoy.value(VALUE_DT, ois, infl)
        res = yoy.position(model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(direct, abs=1e-6)

    def test_engine_breakeven_delta_vs_fd(self, model, infl, yoy):
        """+1bp on the 5Y breakeven, FD vs AD within 0.1%."""
        from adrates_tpu.models.inflation_builder import \
            build_inflation_curve
        ois = model.curves.GBP_OIS_SONIA
        res = yoy.position(model).compute([RequestTypes.DELTA])
        base_v = yoy.value(VALUE_DT, ois, infl)
        bes = list(BE_RATES)
        bes[3] += 0.01  # +1bp in percent units
        m2 = Model(VALUE_DT)
        c2, idx2 = build_inflation_curve(m2, "GBP_RPI_INFLATION", bes,
                                         BE_TENORS, BASE_CPI)
        y2 = YoYInflationSwap(VALUE_DT, "5Y", SwapTypes.PAY, 0.034, idx2,
                              FrequencyTypes.ANNUAL, notional=10_000_000)
        fd = y2.value(VALUE_DT, ois, c2) - base_v
        ad = float(res.risk(CurveTypes.GBP_RPI_INFLATION).risk_ladder[3])
        assert abs(ad - fd) / abs(fd) < 1e-3

    def test_gamma_symmetry(self, model, yoy):
        res = yoy.position(model).compute([RequestTypes.GAMMA])
        for ct in (CurveTypes.GBP_OIS_SONIA, CurveTypes.GBP_RPI_INFLATION):
            g = res.gamma(ct).risk_ladder
            np.testing.assert_allclose(g, g.T, rtol=1e-8, atol=1e-12)
