"""XCCY multi-curve risk: deltas/gammas vs domestic OIS, foreign OIS and
basis spreads, plus the foreign x basis cross-gamma.

Role parity with /root/reference/cavour/market/position/engine.py
(_compute_xccy 1411-1988). Risk views preserved:
 - domestic delta/gamma: partials w.r.t. domestic quotes (XCCY curve fixed)
 - foreign delta/gamma: partials w.r.t. foreign quotes with the XCCY curve
   HELD FIXED (documented policy, engine.py:1692-1700)
 - basis delta/gamma: through the XCCY bootstrap (spreads -> node DFs -> PV)
 - cross-gamma (foreign x basis): FULL mixed second derivative of
   PV(for_rates, spreads) through both the pricing kernel and the
   bootstrap — the reference keeps only the bootstrap mixed-hessian term
   (engine.py:1936-1945); including all terms is an upgrade, not a port.

Everything is one pure function PV(dom_rates, for_rates, spreads) composed
from the OIS bootstrap, the XCCY bootstrap and the leg kernels; each block
of the report is a jax partial/hessian of it.
"""

from __future__ import annotations

from functools import partial
from typing import Set

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bootstrap import bootstrap_ois
from ...ops.interpolation import interp_df, interp_fit
from ...ops.pricers import FixedLegTensor, FloatLegTensor, pv_fixed_leg, \
    pv_float_leg
from ...ops.xccy_bootstrap import bootstrap_xccy
from ...requests.results import (AnalyticsResult, Cashflows, CrossGamma,
                                 Delta, Gamma, Risk, Valuation)
from ...utils.date import Date
from ...utils.day_count import DayCount, DayCountTypes
from ...utils.error import LibError
from ...utils.global_types import CurveTypes, InstrumentTypes, \
    RequestTypes, SwapTypes
from ...utils.global_vars import gDaysInYear
from ...utils.helpers import times_from_dates, to_tenor
from ...trades.rates.swap_fixed_leg import SwapFixedLeg
from ...trades.rates.swap_float_leg import SwapFloatLeg
from ...trades.rates.xccy_curve import XccyCurve


def _find_xccy_curve(model, derivative):
    """Locate the XCCY curve calibrated for this currency pair: exact
    index match first, then any single XccyCurve as a fallback."""
    dom_idx = derivative._domestic_floating_index
    for_idx = derivative._foreign_floating_index
    candidates = [(name, c) for name, c in model._curves_dict.items()
                  if isinstance(c, XccyCurve)]
    for name, curve in candidates:
        if (getattr(curve, "_domestic_index", None) == dom_idx
                and getattr(curve, "_foreign_index", None) == for_idx):
            return name, curve
    if len(candidates) == 1:
        return candidates[0]
    raise LibError(
        f"No XCCY curve found in model for pair "
        f"{for_idx.name}/{dom_idx.name}. Build one with "
        f"model.build_xccy_curve(...). Available curves: "
        f"{list(model._curves_dict.keys())}")


def _basis_curve_type(foreign_ccy, domestic_ccy) -> CurveTypes:
    name = f"{foreign_ccy.name}_{domestic_ccy.name}_BASIS"
    try:
        return CurveTypes[name]
    except KeyError:
        return CurveTypes.USD_GBP_BASIS


def _float_leg_xccy_tensor(leg: SwapFloatLeg, value_dt: Date,
                           foreign_dc: DayCountTypes) -> FloatLegTensor:
    """Foreign float leg: payment/exchange times in XCCY curve units
    (ACT/365F), forward DF queries at LEG-basis times with the divisor in
    the foreign curve's basis — exactly what value() asks the curves for
    (parity: engine.py:1496-1520 + swap_float_leg value())."""
    xccy_dc = DayCountTypes.ACT_365F
    n = len(leg._payment_dts)
    return FloatLegTensor(
        payment_times=np.asarray(
            times_from_dates(leg._payment_dts, value_dt, xccy_dc)),
        start_times=np.asarray(
            times_from_dates(leg._start_accrued_dts, value_dt,
                             leg._dc_type)),
        end_times=np.asarray(
            times_from_dates(leg._end_accrued_dts, value_dt,
                             leg._dc_type)),
        pay_alphas=np.array(leg._year_fracs, dtype=np.float64),
        index_alphas=np.array(
            [DayCount(foreign_dc).year_frac(s, e)[0]
             for s, e in zip(leg._start_accrued_dts, leg._end_accrued_dts)],
            dtype=np.float64),
        spreads=np.full(n, leg._spread),
        notionals=leg._notionals(),
        principal=np.float64(leg._principal * leg._notional),
        leg_sign=np.float64(
            1.0 if leg._leg_type == SwapTypes.RECEIVE else -1.0),
        value_time=np.float64(0.0),
        first_fixing_rate=np.float64(0.0),
        notional_exchange_amount=np.float64(
            float(leg._notional) if leg._notional_exchange else 0.0),
        effective_time=np.float64(
            times_from_dates(leg._effective_dt, value_dt, xccy_dc)),
        maturity_time=np.float64(
            times_from_dates(leg._maturity_dt, value_dt, xccy_dc)),
        cap_rate=np.float64(np.inf),
        floor_rate=np.float64(-np.inf),
        override_first=False,
        notional_exchange=leg._notional_exchange,
        has_cap_floor=False)


def _fixed_exchange_times(derivative, value_dt):
    return (jnp.asarray(times_from_dates(derivative._effective_dt,
                                         value_dt,
                                         DayCountTypes.ACT_ACT_ISDA)),
            jnp.asarray(times_from_dates(derivative._maturity_dt, value_dt,
                                         DayCountTypes.ACT_ACT_ISDA)))


def compute_xccy(engine, derivative, reqs: Set[RequestTypes]
                 ) -> AnalyticsResult:
    model = engine.model
    dom_curve = getattr(model.curves,
                        derivative._domestic_floating_index.name)
    for_curve = getattr(model.curves,
                        derivative._foreign_floating_index.name)
    xccy_name, xccy_curve = _find_xccy_curve(model, derivative)
    spot_fx = xccy_curve._spot_fx  # domestic per foreign
    value_dt = dom_curve._value_dt

    dom_plan = dom_curve._plan
    for_plan = for_curve._plan
    dom_it = dom_curve._interp_type
    for_it = for_curve._interp_type
    xccy_it = xccy_curve._interp_type
    xccy_plan = xccy_curve._plan
    xccy_times_grid = jnp.asarray(xccy_curve._times)
    pv_domestic = jnp.asarray(xccy_curve._pv_domestic)
    for_grid_times = jnp.asarray(for_curve._times)

    # --- compile legs ---------------------------------------------------
    dom_leg = derivative._domestic_leg
    for_leg = derivative._foreign_leg
    dom_is_fixed = isinstance(dom_leg, SwapFixedLeg)
    for_is_fixed = isinstance(for_leg, SwapFixedLeg)

    if dom_is_fixed:
        dom_tensor = dom_leg.tensor(value_dt)
        eff_t, mat_t = _fixed_exchange_times(derivative, value_dt)
        dom_sign = 1.0 if derivative._domestic_leg_type == SwapTypes.RECEIVE \
            else -1.0
        dom_notional = derivative._domestic_notional
    else:
        dom_tensor = dom_leg.tensor(value_dt,
                                    index_dc=dom_curve._dc_type)

    if for_is_fixed:
        # fixed foreign leg discounted on the XCCY grid: times in ACT/365F
        xdc = DayCountTypes.ACT_365F
        for_tensor = FixedLegTensor(
            payment_times=np.asarray(
                times_from_dates(for_leg._payment_dts, value_dt, xdc)),
            payments=np.array(for_leg._payments, dtype=np.float64),
            principal=np.float64(for_leg._principal * for_leg._notional),
            leg_sign=np.float64(
                1.0 if for_leg._leg_type == SwapTypes.RECEIVE else -1.0),
            value_time=np.float64(0.0))
        for_eff_t = jnp.asarray(times_from_dates(derivative._effective_dt,
                                                 value_dt, xdc))
        for_mat_t = jnp.asarray(times_from_dates(derivative._maturity_dt,
                                                 value_dt, xdc))
        for_sign = float(for_tensor.leg_sign)
        for_notional = derivative._foreign_notional
    else:
        for_tensor = _float_leg_xccy_tensor(for_leg, value_dt,
                                            for_curve._dc_type)

    # --- the pure pricing function --------------------------------------

    def exchange_pv(dfs, times, it, eff_t, mat_t, notional, sign):
        q = jnp.stack([eff_t, mat_t])
        d = interp_df(q, times, dfs, it)
        amts = jnp.stack([-notional * sign, notional * sign])
        live = q >= 0.0
        return jnp.sum(jnp.where(live, amts * d, 0.0))

    # All f64-bearing pytrees travel as an explicit argument: closure
    # constants are embedded in the compiled TPU program and participate
    # in fused elementwise ops at f32 (docs/tpu_f64_notes.md).
    consts = dict(dom_plan=dom_plan, for_plan=for_plan,
                  xccy_plan=xccy_plan, xccy_times_grid=xccy_times_grid,
                  pv_domestic=pv_domestic, for_grid_times=for_grid_times)
    if dom_is_fixed:
        consts.update(dom_tensor=dom_tensor, eff_t=eff_t, mat_t=mat_t)
    else:
        consts.update(dom_tensor=dom_tensor)
    if for_is_fixed:
        consts.update(for_tensor=for_tensor, for_eff_t=for_eff_t,
                      for_mat_t=for_mat_t)
    else:
        consts.update(for_tensor=for_tensor)

    def pv_fn(dom_rates, for_rates, xccy_dfs, C):
        dom_times, dom_dfs = bootstrap_ois(dom_rates, C["dom_plan"])
        for_times, for_dfs = bootstrap_ois(for_rates, C["for_plan"])

        # domestic leg on the domestic OIS curve
        if dom_is_fixed:
            dom_pv = pv_fixed_leg(dom_dfs, dom_times, dom_it,
                                  C["dom_tensor"])
            dom_pv = dom_pv + exchange_pv(dom_dfs, dom_times, dom_it,
                                          C["eff_t"], C["mat_t"],
                                          dom_notional, dom_sign)
        else:
            dom_pv = pv_float_leg(dom_dfs, dom_times, dom_it,
                                  C["dom_tensor"])

        # foreign leg: projected on foreign OIS, discounted on XCCY
        if for_is_fixed:
            for_pv = pv_fixed_leg(xccy_dfs, C["xccy_times_grid"], xccy_it,
                                  C["for_tensor"])
            for_pv = for_pv + exchange_pv(xccy_dfs, C["xccy_times_grid"],
                                          xccy_it, C["for_eff_t"],
                                          C["for_mat_t"],
                                          for_notional, for_sign)
        else:
            for_pv = pv_float_leg(xccy_dfs, C["xccy_times_grid"], xccy_it,
                                  C["for_tensor"], idx_dfs=for_dfs,
                                  idx_times=for_times,
                                  idx_interp_type=for_it)

        return dom_pv + spot_fx * for_pv

    def xccy_dfs_fn(spreads, for_rates, C):
        _, for_dfs = bootstrap_ois(for_rates, C["for_plan"])
        _, dfs = bootstrap_xccy(spreads, C["pv_domestic"],
                                C["for_grid_times"],
                                for_dfs, spot_fx, C["xccy_plan"],
                                foreign_interp_type=for_it)
        return dfs

    dom_rates0 = jnp.asarray(dom_curve.swap_rates)
    for_rates0 = jnp.asarray(for_curve.swap_rates)
    spreads0 = jnp.asarray(xccy_curve.basis_spreads)
    xccy_dfs0 = jnp.asarray(xccy_curve._dfs)

    dom_ccy = derivative._domestic_currency
    basis_ct = _basis_curve_type(derivative._foreign_currency, dom_ccy)

    value = None
    if RequestTypes.VALUE in reqs:
        value = Valuation(float(jax.jit(pv_fn)(dom_rates0, for_rates0,
                                               xccy_dfs0, consts)),
                          dom_ccy)

    delta = None
    if RequestTypes.DELTA in reqs:
        d_dom = jax.jit(jax.jacrev(pv_fn, argnums=0))(
            dom_rates0, for_rates0, xccy_dfs0, consts)
        d_for = jax.jit(jax.jacrev(pv_fn, argnums=1))(
            dom_rates0, for_rates0, xccy_dfs0, consts)
        basis_pv = lambda s, C: pv_fn(dom_rates0, for_rates0,
                                      xccy_dfs_fn(s, for_rates0, C), C)
        d_basis = jax.jit(jax.jacrev(basis_pv))(spreads0, consts)
        delta = Risk([
            Delta(np.asarray(d_dom) * 1e-4,
                  to_tenor(list(dom_curve.swap_times)), dom_ccy,
                  derivative._domestic_floating_index),
            Delta(np.asarray(d_for) * 1e-4,
                  to_tenor(list(for_curve.swap_times)), dom_ccy,
                  derivative._foreign_floating_index),
            Delta(np.asarray(d_basis) * 1e-4,
                  to_tenor(list(xccy_curve.swap_times)), dom_ccy,
                  basis_ct)])

    gamma = None
    if RequestTypes.GAMMA in reqs:
        g_dom = jax.jit(jax.jacfwd(jax.jacrev(pv_fn, argnums=0),
                                   argnums=0))(dom_rates0, for_rates0,
                                               xccy_dfs0, consts)
        g_for = jax.jit(jax.jacfwd(jax.jacrev(pv_fn, argnums=1),
                                   argnums=1))(dom_rates0, for_rates0,
                                               xccy_dfs0, consts)
        basis_pv = lambda s, C: pv_fn(dom_rates0, for_rates0,
                                      xccy_dfs_fn(s, for_rates0, C), C)
        g_basis = jax.jit(jax.jacfwd(jax.jacrev(basis_pv)))(spreads0,
                                                            consts)

        # cross-gamma foreign x basis: FULL mixed second derivative of
        # f(for, spreads) = PV(dom0, for, xccy(spreads, for))
        f_cross = lambda fr, s, C: pv_fn(dom_rates0, fr,
                                         xccy_dfs_fn(s, fr, C), C)
        cross = jax.jit(jax.jacfwd(jax.jacrev(f_cross, argnums=0),
                                   argnums=1))(for_rates0, spreads0,
                                               consts)

        cross_gamma = CrossGamma(
            risk_matrix=np.asarray(cross) * 1e-8,
            tenors_curve1=to_tenor(list(for_curve.swap_times)),
            tenors_curve2=to_tenor(list(xccy_curve.swap_times)),
            currency=dom_ccy,
            curve_type_1=derivative._foreign_floating_index,
            curve_type_2=basis_ct)

        gamma = Risk([
            Gamma(np.asarray(g_dom) * 1e-8,
                  to_tenor(list(dom_curve.swap_times)), dom_ccy,
                  derivative._domestic_floating_index),
            Gamma(np.asarray(g_for) * 1e-8,
                  to_tenor(list(for_curve.swap_times)), dom_ccy,
                  derivative._foreign_floating_index),
            Gamma(np.asarray(g_basis) * 1e-8,
                  to_tenor(list(xccy_curve.swap_times)), dom_ccy,
                  basis_ct)],
            cross_gammas=[cross_gamma])

    cashflows = None
    if RequestTypes.CASHFLOWS in reqs:
        pay_dom = dom_leg._leg_type == SwapTypes.PAY
        if dom_is_fixed:
            dom_leg.value(value_dt, dom_curve)
        else:
            dom_leg.value(value_dt, dom_curve, dom_curve)
        if for_is_fixed:
            for_leg.value(value_dt, xccy_curve)
        else:
            for_leg.value(value_dt, xccy_curve, for_curve)
        items = engine._extract_leg_cashflows(
            dom_leg, "Domestic_Pay" if pay_dom else "Domestic_Rec")
        items += engine._extract_leg_cashflows(
            for_leg, "Foreign_Rec" if pay_dom else "Foreign_Pay")
        cashflows = Cashflows(items, dom_ccy)

    return AnalyticsResult(value=value, risk=delta, gamma=gamma,
                           cashflows=cashflows)
