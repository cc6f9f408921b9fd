"""Bonds and FRNs: construction matrix, pricing, analytics, engine risk.

Mirrors the reference's test_bonds_frn.py (26 tests) and
test_credit_products_risk.py (17 tests): duration/convexity/DV01/discount
margin, cap/floor FRNs, amortizing bonds, engine-vs-direct parity.
"""

import numpy as np
import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, CurrencyTypes, CurveTypes,
                               Date, DayCountTypes, FrequencyTypes,
                               LibError, RequestTypes)
from adrates_tpu.models import Model
from adrates_tpu.trades.credit import FRN, Bond

VALUE_DT = Date(1, 1, 2024)


@pytest.fixture(scope="module")
def model():
    m = Model(VALUE_DT)
    m.build_curve(
        "GBP_OIS_SONIA",
        px_list=[5.19, 5.04, 4.71, 4.35, 4.13, 3.93, 3.87, 3.87, 3.88, 3.71],
        tenor_list=["1M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "20Y",
                    "30Y"],
        fixed_dcc_type=DayCountTypes.ACT_365F,
        float_dc_type=DayCountTypes.ACT_365F)
    return m


@pytest.fixture(scope="module")
def curve(model):
    return model.curves.GBP_OIS_SONIA


@pytest.fixture(scope="module")
def bond():
    return Bond(VALUE_DT, "10Y", 0.04, FrequencyTypes.SEMI_ANNUAL,
                DayCountTypes.THIRTY_E_360, CurrencyTypes.GBP)


class TestBondConstruction:
    @pytest.mark.parametrize("freq", [FrequencyTypes.ANNUAL,
                                      FrequencyTypes.SEMI_ANNUAL,
                                      FrequencyTypes.QUARTERLY])
    @pytest.mark.parametrize("dcc", [DayCountTypes.THIRTY_E_360,
                                     DayCountTypes.ACT_ACT_ISDA,
                                     DayCountTypes.ACT_365F])
    def test_construction_matrix(self, freq, dcc):
        b = Bond(VALUE_DT, "5Y", 0.04, freq, dcc, CurrencyTypes.GBP)
        from adrates_tpu.utils import annual_frequency
        assert b._num_coupons == int(5 * annual_frequency(freq))
        assert sum(b._principal_payments) == pytest.approx(100.0)

    def test_issue_after_maturity_raises(self):
        with pytest.raises(LibError):
            Bond(Date(1, 1, 2030), Date(1, 1, 2024), 0.04,
                 FrequencyTypes.ANNUAL, DayCountTypes.THIRTY_E_360,
                 CurrencyTypes.GBP)

    def test_zero_coupon(self, curve):
        z = Bond(VALUE_DT, "5Y", 0.0, FrequencyTypes.ANNUAL,
                 DayCountTypes.ACT_365F, CurrencyTypes.GBP)
        assert z._is_zero_coupon
        assert z.accrued_interest(VALUE_DT.add_tenor("3M")) == 0.0
        pv = z.value(VALUE_DT, curve)
        assert pv == pytest.approx(float(curve.df(z._maturity_dt)) * 100,
                                   rel=1e-10)

    def test_amortization_length_mismatch_raises(self):
        with pytest.raises(LibError):
            Bond(VALUE_DT, "5Y", 0.04, FrequencyTypes.ANNUAL,
                 DayCountTypes.THIRTY_E_360, CurrencyTypes.GBP,
                 amortization_schedule=[50.0, 0.0])


class TestBondPricing:
    def test_premium_bond(self, curve):
        # coupon above the ~3.9% curve -> price above par
        b = Bond(VALUE_DT, "10Y", 0.05, FrequencyTypes.ANNUAL,
                 DayCountTypes.ACT_365F, CurrencyTypes.GBP)
        assert b.clean_price(VALUE_DT, curve) > 100.0

    def test_discount_bond(self, curve):
        b = Bond(VALUE_DT, "10Y", 0.02, FrequencyTypes.ANNUAL,
                 DayCountTypes.ACT_365F, CurrencyTypes.GBP)
        assert b.clean_price(VALUE_DT, curve) < 100.0

    def test_clean_dirty_relationship(self, bond, curve):
        settle = VALUE_DT.add_tenor("3M")
        dirty = bond.dirty_price(VALUE_DT, curve, settlement_dt=settle)
        clean = bond.clean_price(VALUE_DT, curve, settlement_dt=settle)
        accrued_100 = bond.accrued_interest(settle) / 100.0 * 100.0
        assert dirty - clean == pytest.approx(accrued_100, abs=1e-10)
        assert accrued_100 > 0

    def test_z_spread_lowers_price(self, bond, curve):
        p0 = bond.clean_price(VALUE_DT, curve, z_spread=0.0)
        p1 = bond.clean_price(VALUE_DT, curve, z_spread=0.01)
        assert p1 < p0

    def test_ytm_roundtrip(self, bond, curve):
        px = bond.clean_price(VALUE_DT, curve)
        ytm = bond.yield_to_maturity(VALUE_DT, px)
        # reprice from the ytm and recover the clean price
        pv = bond._ytm_pv(VALUE_DT, ytm)
        accrued = bond.accrued_interest(VALUE_DT)
        assert pv == pytest.approx((px + accrued) / 100 * 100, abs=1e-8)

    def test_z_spread_roundtrip(self, bond, curve):
        px = bond.clean_price(VALUE_DT, curve, z_spread=0.0125)
        z = bond.z_spread(VALUE_DT, curve, px)
        assert z == pytest.approx(0.0125, abs=1e-10)

    def test_g_and_i_spreads(self, bond, curve):
        px = bond.clean_price(VALUE_DT, curve)
        g = bond.g_spread(VALUE_DT, curve, px)
        i = bond.i_spread(VALUE_DT, curve, px)
        # spreads computed off the same curve are small
        assert abs(g) < 0.01 and abs(i) < 0.01

    def test_amortizing_pv_below_bullet(self, curve):
        """Upward-sloping discounting: early principal back -> different PV
        than the bullet; totals still conserve principal."""
        amort = Bond.generate_equal_principal_schedule(100.0, 5)
        ab = Bond(VALUE_DT, "5Y", 0.04, FrequencyTypes.ANNUAL,
                  DayCountTypes.THIRTY_E_360, CurrencyTypes.GBP,
                  amortization_schedule=amort)
        bb = Bond(VALUE_DT, "5Y", 0.04, FrequencyTypes.ANNUAL,
                  DayCountTypes.THIRTY_E_360, CurrencyTypes.GBP)
        assert sum(ab._principal_payments) == pytest.approx(100.0)
        assert ab.value(VALUE_DT, curve) != pytest.approx(
            bb.value(VALUE_DT, curve), abs=1e-6)

    def test_annuity_schedule_monotone(self):
        sched = Bond.generate_annuity_schedule(100.0, 10, 0.05,
                                               FrequencyTypes.ANNUAL)
        assert sched[-1] == 0.0
        assert all(a > b for a, b in zip(sched, sched[1:]))


class TestBondRisk:
    def test_duration_ranges(self, bond, curve):
        d = bond.duration(VALUE_DT, curve)
        assert 7.0 < d < 10.0

    def test_convexity_positive(self, bond, curve):
        assert bond.convexity(VALUE_DT, curve) > 0

    def test_dv01_sign_and_size(self, bond, curve):
        dv01 = bond.dv01(VALUE_DT, curve)
        d = bond.duration(VALUE_DT, curve)
        px = bond.dirty_price(VALUE_DT, curve)
        # dv01 ~ duration * price * 1bp
        assert dv01 == pytest.approx(d * px / 100 * 100 * 1e-4, rel=0.05)

    def test_engine_equals_direct(self, model, bond, curve):
        res = bond.position(model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(
            bond.value(VALUE_DT, curve), abs=1e-9)

    def test_engine_delta_vs_scenario_fd(self, model, bond):
        res = bond.position(model).compute([RequestTypes.VALUE,
                                            RequestTypes.DELTA])
        up = model.scenario("GBP_OIS_SONIA", 0.01)
        dn = model.scenario("GBP_OIS_SONIA", -0.01)
        fd = (bond.value(VALUE_DT, up.curves.GBP_OIS_SONIA)
              - bond.value(VALUE_DT, dn.curves.GBP_OIS_SONIA)) / 2
        ad = float(np.sum(res.risk.risk_ladder))
        assert abs(ad - fd) / abs(fd) < 1e-4

    def test_gamma_symmetry(self, model, bond):
        res = bond.position(model).compute([RequestTypes.GAMMA])
        g = res.gamma.risk_ladder
        np.testing.assert_allclose(g, g.T, rtol=1e-10, atol=1e-14)

    def test_key_rate_durations(self, model, bond):
        krds = bond.key_rate_durations(model)
        assert set(krds) == {"1M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y",
                             "10Y", "20Y", "30Y"}
        assert krds["10Y"] > 0.5 * sum(krds.values())

    def test_cs01_positive(self, bond, curve):
        assert bond.cs01(VALUE_DT, curve) > 0

    def test_engine_cashflows(self, model, bond):
        res = bond.position(model).compute([RequestTypes.CASHFLOWS])
        cfs = res.cashflows
        assert len(cfs) == bond._num_coupons + 1  # coupons + principal


class TestFRN:
    @pytest.fixture(scope="class")
    def frn(self):
        return FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                   DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                   CurveTypes.GBP_OIS_SONIA)

    def test_pv_near_par_plus_margin(self, frn, curve):
        # Same projection/discount curve: PV ~ par + PV(margin strip)
        pv = frn.value(VALUE_DT, curve, curve)
        assert 100.0 < pv < 105.0

    def test_zero_margin_frn_at_par(self, curve):
        f = FRN(VALUE_DT, "5Y", 0.0, FrequencyTypes.QUARTERLY,
                DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                CurveTypes.GBP_OIS_SONIA)
        # Telescoping: float coupons + principal == par exactly
        assert f.value(VALUE_DT, curve, curve) == pytest.approx(100.0,
                                                                abs=1e-8)

    def test_cap_lowers_value(self, frn, curve):
        capped = FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                     DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                     CurveTypes.GBP_OIS_SONIA, cap_rate=0.03)
        assert capped.value(VALUE_DT, curve, curve) \
            < frn.value(VALUE_DT, curve, curve)

    def test_floor_raises_value(self, frn, curve):
        floored = FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                      DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                      CurveTypes.GBP_OIS_SONIA, floor_rate=0.05)
        assert floored.value(VALUE_DT, curve, curve) \
            > frn.value(VALUE_DT, curve, curve)

    def test_cap_below_floor_raises(self):
        with pytest.raises(LibError):
            FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                CurveTypes.GBP_OIS_SONIA, cap_rate=0.01, floor_rate=0.05)

    def test_first_fixing_rate_used(self, curve):
        f = FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                CurveTypes.GBP_OIS_SONIA, first_fixing_rate=0.10)
        base = FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                   DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                   CurveTypes.GBP_OIS_SONIA)
        assert f.value(VALUE_DT, curve, curve) \
            > base.value(VALUE_DT, curve, curve)

    def test_discount_margin_roundtrip(self, frn, curve):
        px = frn.clean_price(VALUE_DT, curve, curve, discount_margin=0.0075)
        dm = frn.discount_margin(VALUE_DT, curve, curve, px)
        assert dm == pytest.approx(0.0075, abs=1e-7)

    def test_engine_equals_direct(self, model, frn, curve):
        res = frn.position(model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(
            frn.value(VALUE_DT, curve, curve), abs=1e-9)

    def test_engine_capped_equals_direct(self, model, curve):
        capped = FRN(VALUE_DT, "5Y", 0.005, FrequencyTypes.QUARTERLY,
                     DayCountTypes.ACT_365F, CurrencyTypes.GBP,
                     CurveTypes.GBP_OIS_SONIA, cap_rate=0.03,
                     floor_rate=0.01)
        res = capped.position(model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(
            capped.value(VALUE_DT, curve, curve), abs=1e-9)

    def test_engine_delta_vs_fd(self, model, frn):
        res = frn.position(model).compute([RequestTypes.DELTA])
        up = model.scenario("GBP_OIS_SONIA", 0.01)
        dn = model.scenario("GBP_OIS_SONIA", -0.01)
        fd = (frn.value(VALUE_DT, up.curves.GBP_OIS_SONIA,
                        up.curves.GBP_OIS_SONIA)
              - frn.value(VALUE_DT, dn.curves.GBP_OIS_SONIA,
                          dn.curves.GBP_OIS_SONIA)) / 2
        ad = float(np.sum(res.risk.risk_ladder))
        assert abs(ad - fd) < 5e-4 * max(abs(fd), 1e-3)

    def test_modified_duration_positive(self, frn, curve):
        assert frn.modified_duration(VALUE_DT, curve, curve) > 0

    def test_dv01_positive(self, frn, curve):
        assert frn.dv01(VALUE_DT, curve, curve) > 0

    def test_engine_cashflows(self, model, frn):
        res = frn.position(model).compute([RequestTypes.CASHFLOWS])
        assert len(res.cashflows) == frn._num_coupons + 1
