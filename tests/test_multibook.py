"""Multi-currency multi-curve book: parity against the per-trade engine
and direct valuation, FD-validated deltas, per-trade ladders.

Reference semantics being matched at book scale:
/root/reference/cavour/market/position/engine.py:2639-2728 (dual-curve
float legs), 1411-1988 (XCCY discounting), 700-984 (FRN), 505-698 (bond).
"""

import numpy as np
import pytest

from adrates_tpu.models import Model
from adrates_tpu.parallel import (compile_multibook, make_multibook_fn,
                                  make_per_trade_delta_fn, tile_multibook)
from adrates_tpu.trades.credit import FRN, Bond
from adrates_tpu.trades.rates import OIS, XccyBasisSwap
from adrates_tpu.utils import (BusDayAdjustTypes, CurrencyTypes, CurveTypes,
                               Date, DayCountTypes, FrequencyTypes,
                               InterpTypes, RequestTypes, SwapTypes)

VALUE_DT = Date(1, 1, 2024)


@pytest.fixture(scope="module")
def model():
    m = Model(VALUE_DT)
    m.build_curve("USD_OIS_SOFR", px_list=[5.3, 5.0, 4.6, 4.0, 3.88],
                  tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"],
                  fixed_dcc_type=DayCountTypes.ACT_360,
                  float_dc_type=DayCountTypes.ACT_360,
                  interp_type=InterpTypes.FLAT_FWD_RATES)
    m.build_curve("GBP_OIS_SONIA", px_list=[5.0, 4.7, 4.3, 3.9, 3.87],
                  tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"],
                  fixed_dcc_type=DayCountTypes.ACT_365F,
                  float_dc_type=DayCountTypes.ACT_365F,
                  interp_type=InterpTypes.FLAT_FWD_RATES)
    m.build_xccy_curve(name="GBP_USD_XCCY",
                       domestic_curve_name="USD_OIS_SOFR",
                       foreign_curve_name="GBP_OIS_SONIA",
                       basis_spreads=[-5.0, -8.0, -11.0],
                       tenor_list=["1Y", "5Y", "10Y"], spot_fx=1.27)
    m.build_fx(["GBPUSD"], [1.27])
    return m


def _trades(model):
    gbp_ois = OIS(VALUE_DT, "5Y", SwapTypes.RECEIVE, 0.039,
                  FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
                  CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                  notional=10_000_000,
                  float_dc_type=DayCountTypes.ACT_365F,
                  bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
    usd_ois = OIS(VALUE_DT, "2Y", SwapTypes.PAY, 0.045,
                  FrequencyTypes.QUARTERLY, DayCountTypes.ACT_360,
                  CurveTypes.USD_OIS_SOFR, CurrencyTypes.USD,
                  notional=15_000_000,
                  float_dc_type=DayCountTypes.ACT_360,
                  bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
    xccy = XccyBasisSwap(
        effective_dt=VALUE_DT, term_dt_or_tenor="5Y",
        domestic_notional=12_700_000, foreign_notional=10_000_000,
        domestic_spread=0.0, foreign_spread=-0.0008,
        domestic_freq_type=FrequencyTypes.QUARTERLY,
        foreign_freq_type=FrequencyTypes.QUARTERLY,
        domestic_dc_type=DayCountTypes.ACT_360,
        foreign_dc_type=DayCountTypes.ACT_365F,
        domestic_floating_index=CurveTypes.USD_OIS_SOFR,
        foreign_floating_index=CurveTypes.GBP_OIS_SONIA,
        domestic_currency=CurrencyTypes.USD,
        foreign_currency=CurrencyTypes.GBP)
    frn_plain = FRN(VALUE_DT, "5Y", quoted_margin=0.0015,
                    freq_type=FrequencyTypes.QUARTERLY,
                    dc_type=DayCountTypes.ACT_365F,
                    floating_index=CurveTypes.GBP_OIS_SONIA,
                    currency=CurrencyTypes.GBP, face_value=5_000_000)
    frn_capped = FRN(VALUE_DT, "5Y", quoted_margin=0.0015,
                     freq_type=FrequencyTypes.QUARTERLY,
                     dc_type=DayCountTypes.ACT_365F,
                     floating_index=CurveTypes.GBP_OIS_SONIA,
                     currency=CurrencyTypes.GBP, face_value=5_000_000,
                     cap_rate=0.045, floor_rate=0.02)
    bond = Bond(VALUE_DT, "7Y", coupon=0.04,
                freq_type=FrequencyTypes.SEMI_ANNUAL,
                dc_type=DayCountTypes.ACT_365F,
                currency=CurrencyTypes.GBP, face_value=1_000_000)
    return [gbp_ois, usd_ois, xccy, frn_plain, frn_capped, bond]


def _direct_pvs_gbp(model, trades):
    """Direct per-trade valuations converted to GBP."""
    gbp = model.curves.GBP_OIS_SONIA
    usd = model.curves.USD_OIS_SOFR
    xccy = model.curves["GBP_USD_XCCY"]
    usdgbp = 1.0 / 1.27
    out = []
    for t in trades:
        it = t.derivative_type.name
        if it == "OIS_SWAP":
            curve = gbp if t._currency == CurrencyTypes.GBP else usd
            fx = 1.0 if t._currency == CurrencyTypes.GBP else usdgbp
            out.append(t.value(VALUE_DT, curve) * fx)
        elif it == "XCCY_SWAP":
            pv_usd = t.value(VALUE_DT, domestic_discount_curve=usd,
                             foreign_discount_curve=gbp,
                             xccy_discount_curve=xccy, spot_fx=1.27)
            out.append(pv_usd * usdgbp)
        elif it == "FRN":
            out.append(t.value(VALUE_DT, gbp, gbp))
        elif it == "BOND":
            out.append(t.value(VALUE_DT, gbp))
        else:
            raise AssertionError(it)
    return np.array(out)


class TestMultiBookParity:
    def test_pvs_match_direct(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=False)
        shocks = np.zeros((1, mb.basket.n_quotes))
        out = fn(mb.basket.quotes0, shocks)
        pvs = np.asarray(out["pvs"])[0]
        direct = _direct_pvs_gbp(model, trades)
        np.testing.assert_allclose(pvs, direct, rtol=1e-10, atol=1e-6)

    def test_aggregate_equals_sum(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=False)
        import jax.numpy as jnp
        from adrates_tpu.parallel import aggregate_total
        import jax
        dfs = mb.basket.grids(jnp.asarray(mb.basket.quotes0),
                              jax.device_put(mb.basket.params))
        total = float(aggregate_total(dfs, jax.device_put(mb.aggregate),
                                      jax.device_put(mb.clamp)))
        out = fn(mb.basket.quotes0, np.zeros((1, mb.basket.n_quotes)))
        assert total == pytest.approx(float(np.sum(out["pvs"][0])),
                                      rel=1e-12, abs=1e-6)

    def test_pv_dom_parity(self, model):
        """The in-graph domestic calibration-leg PVs must reproduce the
        stored _pv_domestic (engine == direct contract at the basket
        level) — the base-quote XCCY grid then matches the stored curve."""
        import jax
        import jax.numpy as jnp
        mb = compile_multibook(_trades(model), model,
                               base_currency=CurrencyTypes.GBP)
        basket = mb.basket
        native = basket.native_grids_fn()
        grids = jax.jit(native)(jnp.asarray(basket.quotes0),
                                jax.device_put(basket.params))
        xid = basket.curve_id("GBP_USD_XCCY")
        xcurve = basket.curves[xid]
        np.testing.assert_allclose(np.asarray(grids[xid][1]),
                                   np.asarray(xcurve._dfs),
                                   rtol=1e-12, atol=1e-12)

    def test_delta_vs_fd(self, model):
        """Book delta (full recalibration view) == central FD of the book
        PV under shocked quotes, for a rate pillar AND a basis pillar."""
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=False)
        q0 = np.asarray(mb.basket.quotes0)
        N = q0.shape[0]
        out = fn(q0, np.zeros((1, N)))
        delta = np.asarray(out["delta"])[0]

        h = 1e-6
        sl_gbp = mb.basket.quote_slice("GBP_OIS_SONIA")
        sl_x = mb.basket.quote_slice("GBP_USD_XCCY")
        for j in [sl_gbp.start + 3, sl_x.start + 1,
                  mb.basket.quote_slice("USD_OIS_SOFR").start + 2]:
            sh = np.zeros((2, N))
            sh[0, j] = h
            sh[1, j] = -h
            pv = np.asarray(fn(q0, sh)["pvs"]).sum(axis=1)
            fd = (pv[0] - pv[1]) / (2 * h)
            assert delta[j] == pytest.approx(fd, rel=5e-7, abs=1e-4)

    def test_gamma_symmetry(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=True)
        out = fn(mb.basket.quotes0,
                 np.zeros((1, mb.basket.n_quotes)))
        g = np.asarray(out["gamma"])[0]
        np.testing.assert_allclose(g, g.T, rtol=1e-9, atol=1e-6)

    def test_closed_form_gamma_matches_ad_tower(self, model):
        """The production closed-form split (Jᵀ·H_agg·J + curve-Hessian
        contraction, `_scenario_risk`) must equal a plain jacfwd∘jacrev
        tower of the aggregate to f64 noise — including the clamp slots'
        second-order block and at a shocked point."""
        import jax
        import jax.numpy as jnp
        from adrates_tpu.parallel.multibook import (_agg_clamp,
                                                    _scenario_risk,
                                                    aggregate_total)

        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        basket = mb.basket
        grids = basket.grids
        params = jax.device_put(basket.params)
        agg = jax.device_put(mb.aggregate)
        clamp = jax.device_put(mb.clamp)
        cl_agg = _agg_clamp(clamp, mb.tile)
        q0 = jnp.asarray(basket.quotes0)
        shock = np.zeros(basket.n_quotes)
        shock[1] = 2e-4
        shock[-2] = -1e-4
        q = q0 + jnp.asarray(shock)

        out = jax.jit(lambda qq: _scenario_risk(
            grids, qq, params, agg, cl_agg, True))(q)

        total = lambda qq: aggregate_total(grids(qq, params), agg, cl_agg)
        delta_ref = jax.jacrev(total)(q)
        gamma_ref = jax.jacfwd(jax.jacrev(total))(q)
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(delta_ref),
                                   rtol=1e-11, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["gamma"]),
                                   np.asarray(gamma_ref),
                                   rtol=1e-9, atol=1e-5)

    def test_engine_view_deltas_match_per_trade_engine(self, model):
        """With recalibrate_xccy=False the basket reproduces the per-trade
        engine's risk views: a GBP-only OIS book's GBP ladder equals the
        engine's delta ladder."""
        gbp_only = [t for t in _trades(model)
                    if t.derivative_type.name == "OIS_SWAP"
                    and t._currency == CurrencyTypes.GBP]
        mb = compile_multibook(gbp_only, model,
                               base_currency=CurrencyTypes.GBP,
                               recalibrate_xccy=False)
        fn = make_multibook_fn(mb, want_gamma=False)
        out = fn(mb.basket.quotes0,
                 np.zeros((1, mb.basket.n_quotes)))
        sl = mb.basket.quote_slice("GBP_OIS_SONIA")
        book_ladder = np.asarray(out["delta"])[0][sl] * 1e-4

        res = gbp_only[0].position(model).compute([RequestTypes.DELTA])
        np.testing.assert_allclose(book_ladder, res.risk.risk_ladder,
                                   rtol=1e-9, atol=1e-8)


class TestPerTradeDelta:
    def test_rows_sum_to_book_delta(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        per_trade = make_per_trade_delta_fn(mb, chunk=4)
        lad = np.asarray(per_trade(mb.basket.quotes0))
        assert lad.shape == (len(trades), mb.basket.n_quotes)

        fn = make_multibook_fn(mb, want_gamma=False)
        out = fn(mb.basket.quotes0,
                 np.zeros((1, mb.basket.n_quotes)))
        np.testing.assert_allclose(lad.sum(axis=0),
                                   np.asarray(out["delta"])[0],
                                   rtol=1e-9, atol=1e-6)

    def test_matmul_method_matches_gather(self, model):
        """The dense scatter+MXU-matmul contraction is the same math as
        the gather einsum — identical ladders to f64 noise."""
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        lad_g = np.asarray(
            make_per_trade_delta_fn(mb, chunk=4)(mb.basket.quotes0))
        lad_m = np.asarray(
            make_per_trade_delta_fn(mb, chunk=4, method="matmul")(
                mb.basket.quotes0))
        # atol covers f64 reassociation noise between the two
        # contraction orders on ~1e6-scale ladder entries
        np.testing.assert_allclose(lad_m, lad_g, rtol=1e-12, atol=1e-7)

        with pytest.raises(ValueError):
            make_per_trade_delta_fn(mb, method="bogus")

    def test_f32_ladders_within_reporting_tolerance(self, model):
        import jax.numpy as jnp
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        lad64 = np.asarray(
            make_per_trade_delta_fn(mb, chunk=4)(mb.basket.quotes0))
        for meth in ("gather", "matmul"):
            lad32 = np.asarray(
                make_per_trade_delta_fn(mb, chunk=4, dtype=jnp.float32,
                                        method=meth)(mb.basket.quotes0))
            assert lad32.dtype == np.float32
            scale = np.abs(lad64).max()
            np.testing.assert_allclose(lad32, lad64, rtol=1e-4,
                                       atol=3e-6 * scale)

    def test_single_trade_ladder_matches_engine(self, model):
        gbp_only = [t for t in _trades(model)
                    if t.derivative_type.name == "OIS_SWAP"
                    and t._currency == CurrencyTypes.GBP]
        mb = compile_multibook(gbp_only, model,
                               base_currency=CurrencyTypes.GBP,
                               recalibrate_xccy=False)
        per_trade = make_per_trade_delta_fn(mb, chunk=2)
        lad = np.asarray(per_trade(mb.basket.quotes0))
        sl = mb.basket.quote_slice("GBP_OIS_SONIA")
        res = gbp_only[0].position(model).compute([RequestTypes.DELTA])
        np.testing.assert_allclose(lad[0][sl] * 1e-4,
                                   res.risk.risk_ladder,
                                   rtol=1e-9, atol=1e-8)


class TestPerTradeGamma:
    def test_sums_to_book_gamma(self, model):
        """Per-trade gamma matrices over ALL trades sum to the book
        gamma (both from independent closed-form paths)."""
        from adrates_tpu.parallel import make_per_trade_gamma_fn
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        per = make_per_trade_gamma_fn(mb, list(range(len(trades))))
        gm = np.asarray(per(mb.basket.quotes0))
        assert gm.shape == (len(trades), mb.basket.n_quotes,
                            mb.basket.n_quotes)
        fn = make_multibook_fn(mb, want_gamma=True)
        out = fn(mb.basket.quotes0, np.zeros((1, mb.basket.n_quotes)))
        np.testing.assert_allclose(gm.sum(axis=0),
                                   np.asarray(out["gamma"])[0],
                                   rtol=1e-9, atol=1e-5)

    def test_single_trade_matches_engine(self, model):
        """One OIS trade's gamma block (its own curve) == the engine's
        per-position gamma matrix (reference shape:
        engine.py:2563-2568)."""
        from adrates_tpu.parallel import make_per_trade_gamma_fn
        gbp_only = [t for t in _trades(model)
                    if t.derivative_type.name == "OIS_SWAP"
                    and t._currency == CurrencyTypes.GBP]
        mb = compile_multibook(gbp_only, model,
                               base_currency=CurrencyTypes.GBP,
                               recalibrate_xccy=False)
        per = make_per_trade_gamma_fn(mb, [0])
        gm = np.asarray(per(mb.basket.quotes0))[0]
        sl = mb.basket.quote_slice("GBP_OIS_SONIA")
        res = gbp_only[0].position(model).compute([RequestTypes.GAMMA])
        np.testing.assert_allclose(gm[sl, sl] * 1e-8,
                                   res.gamma.risk_ladder,
                                   rtol=1e-8, atol=1e-8)

    def test_inflation_book_sums(self, model_infl):
        """Per-trade gammas on a ZCIS/YoY book (inflation-factor curve
        rows + breakeven quotes) sum to the book gamma."""
        from adrates_tpu.parallel import make_per_trade_gamma_fn
        trades = _infl_trades(model_infl)
        mb = compile_multibook(trades, model_infl,
                               base_currency=CurrencyTypes.GBP)
        per = make_per_trade_gamma_fn(mb, list(range(len(trades))))
        gm = np.asarray(per(mb.basket.quotes0))
        fn = make_multibook_fn(mb, want_gamma=True)
        out = fn(mb.basket.quotes0, np.zeros((1, mb.basket.n_quotes)))
        np.testing.assert_allclose(gm.sum(axis=0),
                                   np.asarray(out["gamma"])[0],
                                   rtol=1e-9, atol=1e-5)

    def test_lazy_tile_selection(self, model):
        """Selecting the same base trade from different lazy copies
        scales its gamma by the copy's notional multiplier."""
        from adrates_tpu.parallel import make_per_trade_gamma_fn
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        B = len(trades)
        lazy = tile_multibook(mb, 2,
                              notional_scale=np.array([1.0, 2.5]))
        per = make_per_trade_gamma_fn(lazy, [0, B])
        gm = np.asarray(per(mb.basket.quotes0))
        # atol rides on gamma magnitude ~4e8 (unit-rate² units): 1e-5
        # is f64 noise
        np.testing.assert_allclose(gm[1], 2.5 * gm[0],
                                   rtol=1e-12, atol=1e-5)


class TestTileMultibook:
    def test_tiled_pvs(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        scale = np.array([1.0, 2.0, 0.5])
        mb3 = tile_multibook(mb, 3, notional_scale=scale)
        fn = make_multibook_fn(mb3, want_gamma=False)
        out = fn(mb3.basket.quotes0,
                 np.zeros((1, mb3.basket.n_quotes)))
        pvs = np.asarray(out["pvs"])[0].reshape(3, len(trades))
        np.testing.assert_allclose(pvs[1], 2.0 * pvs[0], rtol=1e-12)
        np.testing.assert_allclose(pvs[2], 0.5 * pvs[0], rtol=1e-12)

    def test_lazy_matches_materialized(self, model):
        """Device-side tile expansion == host-materialized tiling for
        per-trade PVs, book delta AND gamma (the lazy path scales the
        aggregate/clamp weights analytically)."""
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        scale = np.array([1.0, 1.7, 0.4, 2.2])
        lazy = tile_multibook(mb, 4, notional_scale=scale)
        mat = tile_multibook(mb, 4, notional_scale=scale,
                             materialize=True)
        assert lazy.tile is not None and mat.tile is None
        shocks = np.zeros((1, mb.basket.n_quotes))
        shocks[0, 3] = 1e-4
        out_l = make_multibook_fn(lazy, want_gamma=True)(
            mb.basket.quotes0, shocks)
        out_m = make_multibook_fn(mat, want_gamma=True)(
            mb.basket.quotes0, shocks)
        np.testing.assert_allclose(np.asarray(out_l["pvs"]),
                                   np.asarray(out_m["pvs"]),
                                   rtol=1e-12, atol=1e-9)
        # atol rides on ladder magnitude ~1e8: 1e-7 is f64 noise (the
        # lazy path scales clamp weights analytically, the materialized
        # path sums expanded slots — same value, different rounding)
        np.testing.assert_allclose(np.asarray(out_l["delta"]),
                                   np.asarray(out_m["delta"]),
                                   rtol=1e-10, atol=1e-7)
        # gamma assembly sums terms of ladder scale (~1e8): reordering
        # noise is ~max|delta|*eps*sqrt(n_terms) ≈ 1e-6, so anchor the
        # absolute floor to the measured ladder magnitude
        gamma_atol = max(1e-9, np.abs(np.asarray(out_m["delta"])).max()
                         * 1e-13)
        np.testing.assert_allclose(np.asarray(out_l["gamma"]),
                                   np.asarray(out_m["gamma"]),
                                   rtol=1e-10, atol=gamma_atol)
        lad_l = np.asarray(make_per_trade_delta_fn(lazy)(
            mb.basket.quotes0))
        lad_m = np.asarray(make_per_trade_delta_fn(mat)(
            mb.basket.quotes0))
        np.testing.assert_allclose(lad_l, lad_m, rtol=1e-10, atol=1e-8)


@pytest.fixture(scope="module")
def model_infl():
    m = Model(VALUE_DT)
    m.build_curve("GBP_OIS_SONIA", px_list=[5.0, 4.7, 4.3, 3.9, 3.87],
                  tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"],
                  fixed_dcc_type=DayCountTypes.ACT_365F,
                  float_dc_type=DayCountTypes.ACT_365F,
                  interp_type=InterpTypes.FLAT_FWD_RATES)
    m.build_inflation_curve("GBP_RPI_INFLATION",
                            breakeven_list=[3.8, 3.5, 3.4, 3.5, 3.3],
                            tenor_list=["1Y", "3Y", "5Y", "10Y", "30Y"],
                            base_cpi=293.0)
    return m


def _infl_trades(model):
    from adrates_tpu.trades.rates import (YoYInflationSwap,
                                          ZeroCouponInflationSwap)
    index = model.curves["GBP_RPI_INFLATION"]._used_swaps[0] \
        ._inflation_index
    zcis = ZeroCouponInflationSwap(
        effective_dt=VALUE_DT, term_dt_or_tenor="5Y",
        fixed_leg_type=SwapTypes.PAY, fixed_rate=0.033,
        inflation_index=index, notional=7_000_000)
    yoy = YoYInflationSwap(
        effective_dt=VALUE_DT, term_dt_or_tenor="4Y",
        fixed_leg_type=SwapTypes.RECEIVE, fixed_rate=0.034,
        inflation_index=index, freq_type=FrequencyTypes.ANNUAL,
        notional=5_000_000, inflation_spread=0.0007)
    ois = OIS(VALUE_DT, "5Y", SwapTypes.RECEIVE, 0.039,
              FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
              CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
              notional=10_000_000, float_dc_type=DayCountTypes.ACT_365F,
              bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
    return [zcis, yoy, ois]


class TestInflationBook:
    """ZCIS/YoY at book scale: breakevens ride inside the packed quote
    vector (VERDICT round-2 item 2); PV/delta/gamma parity vs the
    per-trade engine and FD."""

    def test_quotes_include_breakevens(self, model_infl):
        mb = compile_multibook(_infl_trades(model_infl), model_infl,
                               base_currency=CurrencyTypes.GBP)
        sl = mb.basket.quote_slice("GBP_RPI_INFLATION")
        assert sl.stop - sl.start == 5
        np.testing.assert_allclose(
            np.asarray(mb.basket.quotes0)[sl],
            np.asarray([3.8, 3.5, 3.4, 3.5, 3.3]) / 100.0)

    def test_pvs_match_engine(self, model_infl):
        trades = _infl_trades(model_infl)
        mb = compile_multibook(trades, model_infl,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=False)
        out = fn(mb.basket.quotes0, np.zeros((1, mb.basket.n_quotes)))
        pvs = np.asarray(out["pvs"])[0]
        for k, t in enumerate(trades):
            res = t.position(model_infl).compute([RequestTypes.VALUE])
            assert pvs[k] == pytest.approx(res.value.amount, rel=1e-10,
                                           abs=1e-6)

    def test_deltas_match_engine(self, model_infl):
        trades = _infl_trades(model_infl)
        for t in trades[:2]:            # zcis, yoy
            mb = compile_multibook([t], model_infl,
                                   base_currency=CurrencyTypes.GBP)
            fn = make_multibook_fn(mb, want_gamma=True)
            out = fn(mb.basket.quotes0,
                     np.zeros((1, mb.basket.n_quotes)))
            delta = np.asarray(out["delta"])[0]
            sl_o = mb.basket.quote_slice("GBP_OIS_SONIA")
            sl_i = mb.basket.quote_slice("GBP_RPI_INFLATION")
            res = t.position(model_infl).compute(
                [RequestTypes.DELTA, RequestTypes.GAMMA])
            np.testing.assert_allclose(
                delta[sl_o] * 1e-4,
                res.risk(CurveTypes.GBP_OIS_SONIA).risk_ladder,
                rtol=1e-8, atol=1e-7)
            np.testing.assert_allclose(
                delta[sl_i] * 1e-4,
                res.risk(CurveTypes.GBP_RPI_INFLATION).risk_ladder,
                rtol=1e-8, atol=1e-7)
            gamma = np.asarray(out["gamma"])[0]
            np.testing.assert_allclose(
                gamma[sl_i, sl_i] * 1e-8,
                res.gamma(CurveTypes.GBP_RPI_INFLATION).risk_ladder,
                rtol=1e-7, atol=1e-7)
            np.testing.assert_allclose(
                gamma[sl_o, sl_i] * 1e-8,
                res.gamma.cross_gamma(
                    CurveTypes.GBP_OIS_SONIA,
                    CurveTypes.GBP_RPI_INFLATION).risk_matrix,
                rtol=1e-7, atol=1e-7)

    def test_breakeven_delta_vs_fd(self, model_infl):
        trades = _infl_trades(model_infl)
        mb = compile_multibook(trades, model_infl,
                               base_currency=CurrencyTypes.GBP)
        fn = make_multibook_fn(mb, want_gamma=False)
        q0 = np.asarray(mb.basket.quotes0)
        N = q0.shape[0]
        delta = np.asarray(fn(q0, np.zeros((1, N)))["delta"])[0]
        sl = mb.basket.quote_slice("GBP_RPI_INFLATION")
        h = 1e-6
        for j in [sl.start + 1, sl.start + 2]:
            sh = np.zeros((2, N))
            sh[0, j] = h
            sh[1, j] = -h
            pv = np.asarray(fn(q0, sh)["pvs"]).sum(axis=1)
            fd = (pv[0] - pv[1]) / (2 * h)
            assert delta[j] == pytest.approx(fd, rel=5e-6, abs=1e-3)


class TestShardedMultibook:
    @staticmethod
    def _check(out, ref):
        np.testing.assert_allclose(
            np.asarray(out["total_pv"]),
            np.asarray(ref["pvs"]).sum(axis=1), rtol=1e-12, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(ref["delta"]),
                                   rtol=1e-10, atol=1e-7)
        np.testing.assert_allclose(np.asarray(out["gamma"]),
                                   np.asarray(ref["gamma"]),
                                   rtol=1e-10, atol=1e-6)

    def test_sharded_equals_single_device(self, model):
        """GSPMD row-sharded analytics == unsharded on the virtual
        8-device CPU mesh: total PV, delta and gamma to f64 noise.
        Tiled x5 so NO row count divides the 8-way mesh — the padding
        path (VERDICT r2 item 6) is what runs."""
        import jax
        from jax.sharding import Mesh

        from adrates_tpu.parallel import (make_sharded_multibook_fn,
                                          shard_multibook)

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        mbb = tile_multibook(mb, 5, materialize=True)
        N = mb.basket.n_quotes
        shocks = np.zeros((2, N))
        shocks[1, 2] = 1e-4

        ref = make_multibook_fn(mbb, want_gamma=True)(
            mb.basket.quotes0, shocks)

        mesh = Mesh(np.array(devices[:8]), ("book",))
        fn = make_sharded_multibook_fn(shard_multibook(mbb, mesh), mesh,
                                       want_gamma=True)
        self._check(fn(mb.basket.quotes0, shocks), ref)

    def test_lazy_tile_sharded_no_host_materialization(self, model):
        """A lazy TileSpec book goes straight into
        make_sharded_multibook_fn: base rows replicate, the jitted
        expansion outputs SHARDED full-size rows, results match the
        unsharded materialized reference (VERDICT r2 item 7)."""
        import jax
        from jax.sharding import Mesh

        from adrates_tpu.parallel import make_sharded_multibook_fn

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        scale = np.array([1.0, 1.5, 0.5])
        lazy = tile_multibook(mb, 3, notional_scale=scale)
        mat = tile_multibook(mb, 3, notional_scale=scale,
                             materialize=True)
        assert lazy.tile is not None
        N = mb.basket.n_quotes
        shocks = np.zeros((2, N))
        shocks[1, -1] = 1e-4

        ref = make_multibook_fn(mat, want_gamma=True)(
            mb.basket.quotes0, shocks)
        mesh = Mesh(np.array(devices[:8]), ("book",))
        fn = make_sharded_multibook_fn(lazy, mesh, want_gamma=True)
        self._check(fn(mb.basket.quotes0, shocks), ref)

    def test_2d_dcn_mesh(self, model):
        """Rows shard over BOTH axes of a (dcn=2, book=4) mesh — the
        multi-host layout compiled and executed on the virtual CPU mesh
        (VERDICT r2 item 6)."""
        import jax
        from jax.sharding import Mesh

        from adrates_tpu.parallel import (make_sharded_multibook_fn,
                                          shard_multibook)

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        mbb = tile_multibook(mb, 3, materialize=True)
        N = mb.basket.n_quotes
        shocks = np.zeros((1, N))

        ref = make_multibook_fn(mbb, want_gamma=True)(
            mb.basket.quotes0, shocks)
        mesh = Mesh(np.array(devices[:8]).reshape(2, 4), ("dcn", "book"))
        sharded = shard_multibook(mbb, mesh, axis=("dcn", "book"))
        fn = make_sharded_multibook_fn(sharded, mesh,
                                       axis=("dcn", "book"),
                                       want_gamma=True)
        self._check(fn(mb.basket.quotes0, shocks), ref)


class TestStructuredRisk:
    """The per-stage structured risk pass (parallel/structured_risk.py)
    must reproduce the generic full-graph closed-form split exactly:
    same J (delta bitwise), same gamma to f64 contraction noise."""

    def _compare(self, mb, shock_vec):
        import jax
        import jax.numpy as jnp

        from adrates_tpu.parallel.multibook import _scenario_risk
        from adrates_tpu.parallel.structured_risk import \
            make_structured_risk

        grids = mb.basket.grids
        params = jax.device_put(mb.basket.params)
        agg = jax.device_put(mb.aggregate)
        cl = jax.device_put(mb.clamp) if mb.clamp is not None else None
        q = jnp.asarray(mb.basket.quotes0) + jnp.asarray(shock_vec)
        struct = make_structured_risk(mb.basket)
        a = jax.jit(lambda qq: _scenario_risk(grids, qq, params, agg,
                                              cl, True))(q)
        b = jax.jit(lambda qq: struct(qq, params, agg, cl, True))(q)
        da, db = np.asarray(a["delta"]), np.asarray(b["delta"])
        assert not np.isnan(db).any()
        np.testing.assert_allclose(db, da, rtol=1e-9,
                                   atol=1e-9 * (np.abs(da).max() + 1))
        ga, gb = np.asarray(a["gamma"]), np.asarray(b["gamma"])
        assert not np.isnan(gb).any()
        np.testing.assert_allclose(gb, ga, rtol=1e-7,
                                   atol=1e-8 * (np.abs(ga).max() + 1))

    def test_multi_currency_book(self, model):
        trades = _trades(model)
        mb = compile_multibook(trades, model,
                               base_currency=CurrencyTypes.GBP)
        rng = np.random.default_rng(11)
        self._compare(mb, np.zeros(mb.basket.n_quotes))
        self._compare(mb, rng.normal(0, 1e-3, mb.basket.n_quotes))

    def test_inflation_book(self, model_infl):
        trades = _infl_trades(model_infl)
        mb = compile_multibook(trades, model_infl,
                               base_currency=CurrencyTypes.GBP)
        self._compare(mb, np.zeros(mb.basket.n_quotes))
