"""OIS engine requests: VALUE/DELTA/GAMMA/CASHFLOWS with AD-vs-FD gates.

Mirrors the reference's test_ois_request_types.py (14 tests): AD delta vs
central finite differences within 0.01% (parallel) / 5% (tenor-specific),
gamma symmetry at rtol 1e-10 / atol 1e-14, and Taylor P&L attribution where
the 2nd-order expansion must land within 5-10% of actual P&L at 100-200bp
(reference lines 470-523, 630-703, 748).
"""

import numpy as np
import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, CurrencyTypes, CurveTypes,
                               Date, DayCountTypes, FrequencyTypes,
                               RequestTypes, SwapTypes)
from adrates_tpu.models import Model
from adrates_tpu.trades.rates import OIS

VALUE_DT = Date(1, 1, 2024)


@pytest.fixture(scope="module")
def model(sonia_quotes, gbp_conventions):
    tenors, rates = sonia_quotes
    m = Model(VALUE_DT)
    m.build_curve("GBP_OIS_SONIA", px_list=rates, tenor_list=tenors,
                  **gbp_conventions)
    return m


@pytest.fixture(scope="module")
def swap():
    return OIS(VALUE_DT, "10Y", SwapTypes.RECEIVE, 0.0387,
               FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
               CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
               notional=10_000_000,
               float_dc_type=DayCountTypes.ACT_365F,
               bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)


@pytest.fixture(scope="module")
def full_result(model, swap):
    return swap.position(model).compute(
        [RequestTypes.VALUE, RequestTypes.DELTA, RequestTypes.GAMMA])


def _reval(model, swap, shock):
    shocked = model.scenario("GBP_OIS_SONIA", shock)
    return swap.value(VALUE_DT, shocked.curves.GBP_OIS_SONIA)


class TestValue:
    def test_engine_equals_direct(self, model, swap, full_result):
        direct = swap.value(VALUE_DT, model.curves.GBP_OIS_SONIA)
        assert full_result.value.amount == pytest.approx(direct, abs=1e-6)

    def test_near_par_swap_is_near_zero(self, full_result):
        # coupon 3.87% == 10Y quote -> PV tiny relative to notional
        assert abs(full_result.value.amount) < 10_000

    def test_currency(self, full_result):
        assert full_result.value.currency == CurrencyTypes.GBP

    def test_pay_receive_mirror(self, model):
        kw = dict(fixed_freq_type=FrequencyTypes.ANNUAL,
                  fixed_dc_type=DayCountTypes.ACT_365F,
                  floating_index=CurveTypes.GBP_OIS_SONIA,
                  currency=CurrencyTypes.GBP,
                  float_dc_type=DayCountTypes.ACT_365F,
                  bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
        rec = OIS(VALUE_DT, "7Y", SwapTypes.RECEIVE, 0.04, **kw)
        pay = OIS(VALUE_DT, "7Y", SwapTypes.PAY, 0.04, **kw)
        v_rec = rec.position(model).compute([RequestTypes.VALUE])
        v_pay = pay.position(model).compute([RequestTypes.VALUE])
        assert v_rec.value.amount == pytest.approx(-v_pay.value.amount,
                                                   abs=1e-8)


class TestDelta:
    def test_parallel_ad_vs_fd(self, model, swap, full_result):
        """Reference gate: within 0.01% of 1bp central FD."""
        fd = (_reval(model, swap, 0.01) - _reval(model, swap, -0.01)) / 2
        ad = float(np.sum(full_result.risk.risk_ladder))
        assert abs(ad - fd) / abs(fd) < 1e-4

    @pytest.mark.parametrize("tenor", ["2Y", "5Y", "10Y"])
    def test_tenor_ad_vs_fd(self, model, swap, full_result, sonia_quotes,
                            tenor):
        """Reference gate: tenor-specific within 5%."""
        tenors, _ = sonia_quotes
        fd = (_reval(model, swap, {tenor: 0.01})
              - _reval(model, swap, {tenor: -0.01})) / 2
        ad = float(full_result.risk.risk_ladder[tenors.index(tenor)])
        if abs(fd) > 1e-4:
            assert abs(ad - fd) / abs(fd) < 0.05

    def test_receiver_has_positive_parallel_delta(self, full_result):
        # Receiver of fixed loses when rates rise: delta < 0 per +1bp
        assert float(np.sum(full_result.risk.risk_ladder)) < 0

    def test_ladder_concentrated_at_maturity(self, full_result,
                                             sonia_quotes):
        tenors, _ = sonia_quotes
        lad = np.abs(full_result.risk.risk_ladder)
        assert np.argmax(lad) == tenors.index("10Y")

    def test_tenors_labels(self, full_result, sonia_quotes):
        assert len(full_result.risk.tenors) == len(sonia_quotes[0])


class TestGamma:
    def test_symmetry(self, full_result):
        g = full_result.gamma.risk_ladder
        np.testing.assert_allclose(g, g.T, rtol=1e-10, atol=1e-14)

    def test_shape(self, full_result, sonia_quotes):
        n = len(sonia_quotes[0])
        assert full_result.gamma.risk_ladder.shape == (n, n)

    @pytest.mark.parametrize("shock_bp", [100, 200])
    def test_taylor_attribution(self, model, swap, full_result, shock_bp):
        """2nd-order Taylor explains large-shock P&L within 5-10% and
        strictly improves on 1st-order (reference lines 630-703)."""
        shock_pct = shock_bp / 100.0
        base = swap.value(VALUE_DT, model.curves.GBP_OIS_SONIA)
        pnl = _reval(model, swap, shock_pct) - base
        delta_total = float(np.sum(full_result.risk.risk_ladder))
        gamma_total = float(np.sum(full_result.gamma.risk_ladder))
        order1 = delta_total * shock_bp
        order2 = order1 + 0.5 * gamma_total * shock_bp ** 2
        assert abs(order2 - pnl) <= abs(order1 - pnl) * 0.5
        assert abs(order2 - pnl) / abs(pnl) < 0.05


class TestSpeed:
    """Third-order SPEED request — defined-but-unimplemented in the
    reference (RequestTypes.SPEED, global_types); here it is one more
    jacfwd level over the gamma tower."""

    @pytest.fixture(scope="class")
    def speed_result(self, model, swap):
        return swap.position(model).compute(
            [RequestTypes.GAMMA, RequestTypes.SPEED])

    def test_shape_and_symmetry(self, speed_result, sonia_quotes):
        cube = speed_result.speed.risk_cube
        n = len(sonia_quotes[0])
        assert cube.shape == (n, n, n)
        # third partials commute: full permutation symmetry
        np.testing.assert_allclose(cube, np.transpose(cube, (1, 0, 2)),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(cube, np.transpose(cube, (0, 2, 1)),
                                   rtol=1e-9, atol=1e-12)

    def test_slice_is_fd_of_gamma(self, model, swap, speed_result):
        """speed[i] ≈ central FD of the gamma matrix w.r.t. pillar i
        (percent-unit scenario shock -> 1e-2 rate units)."""
        i = 8
        tenor = speed_result.speed.tenors[i]
        h_pct = 0.05                       # 5bp in percent units
        up = swap.position(
            model.scenario("GBP_OIS_SONIA", {tenor: h_pct})).compute(
            [RequestTypes.GAMMA]).gamma.risk_ladder
        dn = swap.position(
            model.scenario("GBP_OIS_SONIA", {tenor: -h_pct})).compute(
            [RequestTypes.GAMMA]).gamma.risk_ladder
        fd = (up - dn) / (2 * h_pct * 1e-2) * 1e-4   # per-bp³ scaling
        sl = speed_result.speed.slice(tenor).risk_ladder
        np.testing.assert_allclose(sl, fd, rtol=5e-3, atol=2e-9)


class TestCashflows:
    def test_cashflows_structure(self, model, swap):
        res = swap.position(model).compute([RequestTypes.CASHFLOWS])
        cfs = res.cashflows
        assert len(cfs.fixed) == 10
        assert len(cfs.floating) == 10
        assert len(cfs) == 20

    def test_cashflow_pv_matches_value(self, model, swap):
        res = swap.position(model).compute([RequestTypes.VALUE,
                                            RequestTypes.CASHFLOWS])
        cfs = res.cashflows
        # receive fixed, pay float: fixed pv - float pv = value
        net = cfs.fixed.total_pv - cfs.floating.total_pv
        assert net == pytest.approx(res.value.amount, abs=1e-6)


class TestDifferentFrequencies:
    @pytest.mark.parametrize("freq", [FrequencyTypes.SEMI_ANNUAL,
                                      FrequencyTypes.QUARTERLY])
    def test_engine_direct_parity(self, model, freq):
        swap = OIS(VALUE_DT, "5Y", SwapTypes.PAY, 0.04, freq,
                   DayCountTypes.ACT_365F, CurveTypes.GBP_OIS_SONIA,
                   CurrencyTypes.GBP, float_freq_type=freq,
                   float_dc_type=DayCountTypes.ACT_365F,
                   bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
        res = swap.position(model).compute([RequestTypes.VALUE])
        direct = swap.value(VALUE_DT, model.curves.GBP_OIS_SONIA)
        assert res.value.amount == pytest.approx(direct, abs=1e-6)


class TestMixedDayCountForwardBasis:
    """Regression: the engine kernel's forward divisor must use the INDEX
    curve's day count (value() parity, reference swap_float_leg.py:229-233),
    not the leg's payment basis. With a curve calibrated on ACT_360 floats
    and a trade accruing ACT_365F, the two alphas differ by ~365/360 and
    engine != direct by ~1.4% of the float PV if the kernel reuses
    pay_alphas."""

    @pytest.fixture(scope="class")
    def mixed_model(self):
        m = Model(VALUE_DT)
        # build_curve defaults: ACT_360 fixed & float legs
        m.build_curve("GBP_OIS_SONIA",
                      px_list=[4.2, 4.0, 3.8, 3.7, 3.5],
                      tenor_list=["1Y", "2Y", "5Y", "10Y", "30Y"])
        return m

    @pytest.fixture(scope="class")
    def mixed_swap(self):
        # float leg ACT_365F != curve day count ACT_360
        return OIS(VALUE_DT, "10Y", SwapTypes.PAY, 0.037,
                   FrequencyTypes.ANNUAL, DayCountTypes.ACT_360,
                   CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                   notional=1_000_000,
                   float_dc_type=DayCountTypes.ACT_365F)

    def test_engine_equals_direct(self, mixed_model, mixed_swap):
        direct = mixed_swap.value(VALUE_DT,
                                  mixed_model.curves.GBP_OIS_SONIA)
        res = mixed_swap.position(mixed_model).compute([RequestTypes.VALUE])
        assert res.value.amount == pytest.approx(direct, abs=1e-6)

    def test_book_equals_direct(self, mixed_model, mixed_swap):
        import jax.numpy as jnp
        from adrates_tpu.parallel.book import book_pvs, compile_book
        curve = mixed_model.curves.GBP_OIS_SONIA
        book = compile_book([mixed_swap], VALUE_DT,
                            index_dc=curve._dc_type)
        pvs = book_pvs(jnp.asarray(curve.swap_rates), curve._plan,
                       curve._interp_type, book)
        direct = mixed_swap.value(VALUE_DT, curve)
        assert float(pvs[0]) == pytest.approx(direct, abs=1e-6)
