"""Legacy raw-input engine API: curve bootstrap and per-leg analytics
from (swap_rates, swap_times, year_fracs) triples.

Parity: /root/reference/cavour/market/position/engine.py:2246-3180
(build_curve_ad, value/valuation/delta/gamma_fixed_leg,
value/valuation/delta/gamma_float_leg). The reference hand-chains a
cached DF-jacobian/hessian through grad-in-DF-space; here the whole
pv(rates) composition — node scan + interpolation + leg sum — is one
traced function, so delta/gamma are jacrev/jacfwd-of-jacrev through it:
identical numbers (exact AD either way), a third of the code, and no
rates-ignoring cache key (the reference's `_curve_cache` collides on
equal pillar times, SURVEY §5). All kernels are module-level jits over
array operands, so repeated calls (FD loops, bump ladders) hit the
compile cache instead of re-tracing per closure.

Units follow the reference: rates are decimals, delta is scaled 1e-4
(per bp) and gamma 1e-8 (per bp^2).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.interpolation import simple_df
from ...requests.results import Delta, Gamma, Valuation
from ...utils.global_types import InterpTypes, SwapTypes
from ...utils.helpers import times_from_dates, to_tenor


# ---------------------------------------------------------------------------
# node plan: host-side, hashable-key cached


@lru_cache(maxsize=256)
def _legacy_plan(swap_times: tuple, year_fracs: tuple):
    """Expand every swap's coupon times (cumulative year fracs) into one
    sorted node list. Each node keeps its parent swap's index and the
    node index of the swap's previous coupon (first occurrence of the
    2-dp-rounded key, reference engine.py:2282-2330), so the par
    recursion df_k = (1 - r·A_prev) / (1 + r·α_k) can run as one scan.
    Duplicate times are kept — each swap's chain carries its own rate,
    as the reference documents ("each intermediate point inherits its
    parent swap's rate").

    Deliberate divergence from the reference (documented, regression
    test ``test_engine_legacy.py::test_tiny_first_period_annuity``):
    when a swap's FIRST accrual fraction rounds to 0.00 at 2dp (first
    coupon <= ~2 days out), its second coupon's prev_key 0.0 resolves
    here to the tiny first node — carrying that node's real (tiny but
    nonzero) annuity — whereas the reference resolves it to a seeded
    t=0 point with pv01 = 0, silently dropping the first period's
    annuity from the chain. Keeping the true annuity is mathematically
    more correct (the bootstrapped curve still reprices the input swap;
    the reference's curve is off by ~2e-4 in DF at the next coupon
    node), so we keep it and document the ~2e-4 divergence instead of
    reproducing the drop."""
    nodes = []  # (t_exact, key, alpha, prev_key, swap_idx)
    for i, fracs in enumerate(year_fracs):
        cum = 0.0
        for j, frac in enumerate(fracs):
            prev = cum
            cum += float(frac)
            nodes.append((cum, round(cum, 2), float(frac),
                          round(prev, 2) if j > 0 else None, i))
    nodes.sort(key=lambda p: p[0])
    first_at = {}
    for idx, p in enumerate(nodes):
        first_at.setdefault(p[1], idx)
    prev_idx = np.array(
        [first_at.get(p[3], -1) if p[3] is not None else -1 for p in nodes],
        dtype=np.int32)
    return dict(
        t=np.array([p[0] for p in nodes]),
        alpha=np.array([p[2] for p in nodes]),
        swap=np.array([p[4] for p in nodes], dtype=np.int32),
        prev=prev_idx,
    )


def _legacy_dfs(rates, alpha, swap_idx, prev_idx):
    """DFs at every node as a pure function of the quote vector."""
    node_rate = rates[swap_idx]

    def step(pv01, inp):
        i, r, a, prev = inp
        a_prev = jnp.where(prev < 0, 0.0, pv01[prev])
        df = (1.0 - r * a_prev) / (1.0 + r * a)
        return pv01.at[i].set(a_prev + a * df), df

    n = alpha.shape[0]
    _, dfs = lax.scan(step, jnp.zeros(n, dtype=rates.dtype),
                      (jnp.arange(n), node_rate, jnp.asarray(alpha),
                       jnp.asarray(prev_idx)))
    return dfs


def _anchored_curve(rates, alpha, swap_idx, prev_idx, node_t):
    """(times, dfs(rates)) with a near-zero anchor prepended so
    sub-first-node queries (value date, seasoned accrual starts)
    interpolate; its DF is the constant 1 (zero sensitivity)."""
    dfs = _legacy_dfs(rates, alpha, swap_idx, prev_idx)
    times = jnp.concatenate([jnp.full(1, 1e-8, node_t.dtype), node_t])
    dfs = jnp.concatenate([jnp.ones(1, dfs.dtype), dfs])
    return times, dfs


# ---------------------------------------------------------------------------
# leg pv kernels (pure in every operand; rates first for AD)


def _fixed_pv_raw(rates, alpha, swap_idx, prev_idx, node_t, pay_t,
                  payments, mask, principal, sign, interp_type):
    times, dfs = _anchored_curve(rates, alpha, swap_idx, prev_idx, node_t)
    df_p = simple_df(pay_t, times, dfs, interp_type)
    coupon_pv = jnp.sum(jnp.where(mask, payments * df_p, 0.0))
    prin_pv = jnp.where(mask[-1], principal * df_p[-1], 0.0)
    return sign * (coupon_pv + prin_pv)


def _float_pv_raw(rates, alpha, swap_idx, prev_idx, node_t, pay_t, start_t,
                  end_t, alphas, notionals, spread, fix0, mask, principal,
                  sign, interp_type, idx_interp_type, override):
    times, dfs = _anchored_curve(rates, alpha, swap_idx, prev_idx, node_t)
    # forwards off the (same or separately-schemed) index curve; the
    # near-zero anchor clamps seasoned accrual starts to DF(0)=1
    df_s = simple_df(jnp.maximum(start_t, 1e-8), times, dfs,
                     idx_interp_type)
    df_e = simple_df(end_t, times, dfs, idx_interp_type)
    fwd = jnp.where(alphas > 0.0, (df_s / df_e - 1.0) / alphas, 0.0)
    if override:
        fwd = fwd.at[0].set(fix0)
    cf = (fwd + spread) * alphas * notionals
    df_p = simple_df(pay_t, times, dfs, interp_type)
    coupon_pv = jnp.sum(jnp.where(mask, cf * df_p, 0.0))
    prin_pv = jnp.where(mask[-1], principal * df_p[-1], 0.0)
    return sign * (coupon_pv + prin_pv)


def _float_pv_disc_curve_raw(rates, alpha, swap_idx, prev_idx, node_t,
                             disc_times, disc_dfs, pay_t, start_t, end_t,
                             alphas, notionals, spread, fix0, mask,
                             principal, sign, disc_interp_type,
                             idx_interp_type, override):
    """Float leg discounted on a PREBUILT curve (times/dfs constants wrt
    the quote vector) with forwards projected off the bootstrapped index
    curve — the reference's XccyCurve-as-discount branch
    (engine.py:2839-2864). NOTE the reference never produced greeks in
    this branch: it sets jac=None on the discount side and then raises
    (``jnp.dot(grad_dfs, None)``) on any DELTA/GAMMA request. The
    index-curve-only greeks this kernel yields (discount grid held
    fixed, all sensitivity through the projection curve) are a
    deliberate, FD-validated EXTENSION over the reference
    (tests/test_engine_legacy.py), not a parity behavior."""
    times, dfs = _anchored_curve(rates, alpha, swap_idx, prev_idx, node_t)
    df_s = simple_df(jnp.maximum(start_t, 1e-8), times, dfs,
                     idx_interp_type)
    df_e = simple_df(end_t, times, dfs, idx_interp_type)
    fwd = jnp.where(alphas > 0.0, (df_s / df_e - 1.0) / alphas, 0.0)
    if override:
        fwd = fwd.at[0].set(fix0)
    cf = (fwd + spread) * alphas * notionals
    df_p = simple_df(pay_t, disc_times, disc_dfs, disc_interp_type)
    coupon_pv = jnp.sum(jnp.where(mask, cf * df_p, 0.0))
    prin_pv = jnp.where(mask[-1], principal * df_p[-1], 0.0)
    return sign * (coupon_pv + prin_pv)


_STATIC_F = ("interp_type",)
_STATIC_FL = ("interp_type", "idx_interp_type", "override")
_STATIC_FX = ("disc_interp_type", "idx_interp_type", "override")

_fixed_value = jax.jit(_fixed_pv_raw, static_argnames=_STATIC_F)
_fixed_delta = jax.jit(jax.jacrev(_fixed_pv_raw), static_argnames=_STATIC_F)
_fixed_gamma = jax.jit(jax.jacfwd(jax.jacrev(_fixed_pv_raw)),
                       static_argnames=_STATIC_F)
_float_value = jax.jit(_float_pv_raw, static_argnames=_STATIC_FL)
_float_delta = jax.jit(jax.jacrev(_float_pv_raw), static_argnames=_STATIC_FL)
_float_gamma = jax.jit(jax.jacfwd(jax.jacrev(_float_pv_raw)),
                       static_argnames=_STATIC_FL)
_float_xccy_value = jax.jit(_float_pv_disc_curve_raw,
                            static_argnames=_STATIC_FX)
_float_xccy_delta = jax.jit(jax.jacrev(_float_pv_disc_curve_raw),
                            static_argnames=_STATIC_FX)
_float_xccy_gamma = jax.jit(jax.jacfwd(jax.jacrev(_float_pv_disc_curve_raw)),
                            static_argnames=_STATIC_FX)


# ---------------------------------------------------------------------------
# Engine-facing mixin


class LegacyLegAnalytics:
    """Raw-input per-leg entry points mixed into Engine."""

    def build_curve_ad(self, swap_rates, swap_times, year_fracs):
        """(all node times, dfs) of the legacy par bootstrap, with the
        reference's leading t=0 / df=1.0 point (reference
        engine.py:2281-2360 seeds the point list with a zero-accrual
        t=0 entry whose scan step yields exactly 1)."""
        plan = _legacy_plan(tuple(swap_times),
                            tuple(tuple(f) for f in year_fracs))
        dfs = _legacy_dfs(jnp.asarray(swap_rates, dtype=jnp.float64),
                          plan["alpha"], plan["swap"], plan["prev"])
        times = jnp.concatenate([jnp.zeros(1), jnp.asarray(plan["t"])])
        dfs = jnp.concatenate([jnp.ones(1, dfs.dtype), dfs])
        return times, dfs

    # -- operand packing -----------------------------------------------------

    @staticmethod
    def _fixed_args(swap_times, year_fracs, leg, value_dt, interp_type):
        plan = _legacy_plan(tuple(swap_times),
                            tuple(tuple(f) for f in year_fracs))
        dc = leg._dc_type
        pay_t = np.array([times_from_dates(d, value_dt, dc)
                          for d in leg._payment_dts])
        return dict(
            alpha=plan["alpha"], swap_idx=plan["swap"],
            prev_idx=plan["prev"], node_t=jnp.asarray(plan["t"]),
            pay_t=jnp.asarray(pay_t),
            payments=jnp.asarray(np.asarray(leg._payments,
                                            dtype=np.float64)),
            mask=jnp.asarray(pay_t > 0.0),
            principal=float(leg._principal),
            sign=1.0 if leg._leg_type == SwapTypes.RECEIVE else -1.0,
            interp_type=InterpTypes(interp_type))

    @staticmethod
    def _float_args(swap_times, year_fracs, leg, value_dt, interp_type,
                    index_curve_type=None, first_fixing_rate=None):
        plan = _legacy_plan(tuple(swap_times),
                            tuple(tuple(f) for f in year_fracs))
        dc = leg._dc_type
        pay_t = np.array([times_from_dates(d, value_dt, dc)
                          for d in leg._payment_dts])
        it = InterpTypes(interp_type)
        return dict(
            alpha=plan["alpha"], swap_idx=plan["swap"],
            prev_idx=plan["prev"], node_t=jnp.asarray(plan["t"]),
            pay_t=jnp.asarray(pay_t),
            start_t=jnp.asarray([times_from_dates(d, value_dt, dc)
                                 for d in leg._start_accrued_dts]),
            end_t=jnp.asarray([times_from_dates(d, value_dt, dc)
                               for d in leg._end_accrued_dts]),
            alphas=jnp.asarray(np.asarray(leg._year_fracs,
                                          dtype=np.float64)),
            notionals=jnp.asarray(np.asarray(
                leg._notional_array or [leg._notional]
                * len(leg._year_fracs), dtype=np.float64)),
            spread=float(leg._spread),
            fix0=(0.0 if first_fixing_rate is None
                  else float(first_fixing_rate)),
            mask=jnp.asarray(pay_t >= 0.0),
            principal=float(leg._principal),
            sign=1.0 if leg._leg_type == SwapTypes.RECEIVE else -1.0,
            interp_type=it,
            idx_interp_type=(it if index_curve_type is None
                             else InterpTypes(index_curve_type)),
            override=first_fixing_rate is not None)

    @staticmethod
    def _float_route(swap_times, year_fracs, leg, value_dt,
                     discount_curve_type, index_curve_type,
                     first_fixing_rate):
        """(value, delta, gamma kernels, packed args) for the float leg.
        ``discount_curve_type`` is an InterpTypes — or a prebuilt
        XccyCurve, in which case discounting rides the curve's static
        (times, dfs) grid and only the index curve is bootstrapped from
        the quote vector (reference engine.py:2839-2864)."""
        from ...trades.rates.xccy_curve import XccyCurve
        if not isinstance(discount_curve_type, XccyCurve):
            args = LegacyLegAnalytics._float_args(
                swap_times, year_fracs, leg, value_dt,
                discount_curve_type, index_curve_type, first_fixing_rate)
            return _float_value, _float_delta, _float_gamma, args
        curve = discount_curve_type
        it = InterpTypes(curve._interp_type)
        base = LegacyLegAnalytics._float_args(
            swap_times, year_fracs, leg, value_dt, it,
            index_curve_type if index_curve_type is not None else it,
            first_fixing_rate)
        args = dict(base,
                    disc_times=jnp.asarray(curve._times),
                    disc_dfs=jnp.asarray(curve._dfs),
                    disc_interp_type=it)
        del args["interp_type"]
        return _float_xccy_value, _float_xccy_delta, _float_xccy_gamma, args

    def _measures(self, value_k, delta_k, gamma_k, args, swap_rates,
                  swap_times, leg, requests) -> Dict:
        rates = jnp.asarray(swap_rates, dtype=jnp.float64)
        tenors = to_tenor(list(swap_times))
        out = {}
        if "value" in requests:
            out["value"] = Valuation(float(value_k(rates, **args)),
                                     leg._currency)
        if "delta" in requests:
            out["delta"] = Delta(
                np.asarray(delta_k(rates, **args)) * 1e-4,
                tenors, leg._currency, leg._floating_index)
        if "gamma" in requests:
            out["gamma"] = Gamma(
                np.asarray(gamma_k(rates, **args)) * 1e-8,
                tenors, leg._currency, leg._floating_index)
        return out

    def _fixed_leg_analytics(self, swap_rates, swap_times, year_fracs,
                             leg, value_dt, interp_type,
                             requests: Sequence[str]) -> Dict:
        args = self._fixed_args(swap_times, year_fracs, leg, value_dt,
                                interp_type)
        return self._measures(_fixed_value, _fixed_delta, _fixed_gamma,
                              args, swap_rates, swap_times, leg, requests)

    def _float_leg_analytics(self, swap_rates, swap_times, year_fracs,
                             leg, value_dt, discount_curve_type,
                             index_curve_type=None, first_fixing_rate=None,
                             requests: Sequence[str] = ("value",)) -> Dict:
        value_k, delta_k, gamma_k, args = self._float_route(
            swap_times, year_fracs, leg, value_dt, discount_curve_type,
            index_curve_type, first_fixing_rate)
        return self._measures(value_k, delta_k, gamma_k,
                              args, swap_rates, swap_times, leg, requests)

    # -- public wrappers (reference names/returns) ---------------------------

    def value_fixed_leg(self, swap_rates, swap_times, year_fracs,
                        fixed_leg_details, value_dt, interpolator_dc_type):
        args = self._fixed_args(swap_times, year_fracs, fixed_leg_details,
                                value_dt, interpolator_dc_type)
        return _fixed_value(jnp.asarray(swap_rates, dtype=jnp.float64),
                            **args)

    def valuation_fixed_leg(self, swap_rates, swap_times, year_fracs,
                            fixed_leg_details, value_dt,
                            interpolator_dc_type):
        return self._fixed_leg_analytics(
            swap_rates, swap_times, year_fracs, fixed_leg_details,
            value_dt, interpolator_dc_type, ("value",))["value"]

    def delta_fixed_leg(self, swap_rates, swap_times, year_fracs,
                        fixed_leg_details, value_dt, interpolator_dc_type):
        return self._fixed_leg_analytics(
            swap_rates, swap_times, year_fracs, fixed_leg_details,
            value_dt, interpolator_dc_type, ("delta",))["delta"]

    def gamma_fixed_leg(self, swap_rates, swap_times, year_fracs,
                        fixed_leg_details, value_dt, interpolator_dc_type):
        return self._fixed_leg_analytics(
            swap_rates, swap_times, year_fracs, fixed_leg_details,
            value_dt, interpolator_dc_type, ("gamma",))["gamma"]

    def value_float_leg(self, swap_rates, swap_times, year_fracs,
                        floating_leg_details, value_dt, discount_curve_type,
                        index_curve_type=None, first_fixing_rate=None):
        value_k, _, _, args = self._float_route(
            swap_times, year_fracs, floating_leg_details, value_dt,
            discount_curve_type, index_curve_type, first_fixing_rate)
        return value_k(jnp.asarray(swap_rates, dtype=jnp.float64), **args)

    def valuation_float_leg(self, swap_rates, swap_times, year_fracs,
                            floating_leg_details, value_dt,
                            discount_curve_type, index_curve_type=None,
                            first_fixing_rate=None):
        return self._float_leg_analytics(
            swap_rates, swap_times, year_fracs, floating_leg_details,
            value_dt, discount_curve_type, index_curve_type,
            first_fixing_rate, ("value",))["value"]

    def delta_float_leg(self, swap_rates, swap_times, year_fracs,
                        floating_leg_details, value_dt, discount_curve_type,
                        index_curve_type=None, first_fixing_rate=None):
        return self._float_leg_analytics(
            swap_rates, swap_times, year_fracs, floating_leg_details,
            value_dt, discount_curve_type, index_curve_type,
            first_fixing_rate, ("delta",))["delta"]

    def gamma_float_leg(self, swap_rates, swap_times, year_fracs,
                        floating_leg_details, value_dt, discount_curve_type,
                        index_curve_type=None, first_fixing_rate=None):
        return self._float_leg_analytics(
            swap_rates, swap_times, year_fracs, floating_leg_details,
            value_dt, discount_curve_type, index_curve_type,
            first_fixing_rate, ("gamma",))["gamma"]
