"""Generate reference-parity constants by RUNNING the upstream reference
(/root/reference, pure Python) with pass-through shims for its optional
compiled deps (numba/prettytable/plotly/xbbg — see /tmp/numba_shim).

Outputs JSON to stdout: XCCY curve node DFs, a basis-swap engine
VALUE+DELTA report, a ZCIS direct PV and a YoY engine VALUE+DELTA report,
for the exact market configs used by tests/test_reference_parity.py.

Run manually (CPU):  python benchmarks/gen_reference_parity.py
The hardcoded constants in the test file were produced by this script;
regenerating requires the shim directory (created by the verify recipe).
"""

import json
import sys

sys.path.insert(0, "/tmp/numba_shim")
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from cavour.utils.date import Date
from cavour.utils.frequency import FrequencyTypes
from cavour.utils.day_count import DayCountTypes
from cavour.utils.calendar import BusDayAdjustTypes
from cavour.utils.global_types import (CurveTypes, SwapTypes, RequestTypes,
                                       InflationIndexTypes)
from cavour.utils.currency import CurrencyTypes
from cavour.market.curves.interpolator import InterpTypes
from cavour.models.models import Model
from cavour.market.position.engine import Engine
from cavour.trades.rates.xccy_basis_swap import XccyBasisSwap
from cavour.trades.rates.zcis import ZeroCouponInflationSwap
from cavour.trades.rates.yoy_inflation_swap import YoYInflationSwap
from cavour.market.curves.inflation_curve import InflationCurve
from cavour.market.indices.inflation_index import InflationIndex

VALUE_DT = Date(1, 1, 2024)
out = {}

# --- XCCY: same config as tests/test_multibook.py ------------------------
m = Model(VALUE_DT)
m.build_curve(name="USD_OIS_SOFR", px_list=[5.3, 5.0, 4.6, 4.0, 3.88],
              tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"], spot_days=0,
              swap_type=SwapTypes.PAY,
              fixed_dcc_type=DayCountTypes.ACT_360,
              fixed_freq_type=FrequencyTypes.ANNUAL,
              float_freq_type=FrequencyTypes.ANNUAL,
              float_dc_type=DayCountTypes.ACT_360,
              bus_day_type=BusDayAdjustTypes.MODIFIED_FOLLOWING,
              interp_type=InterpTypes.FLAT_FWD_RATES)
m.build_curve(name="GBP_OIS_SONIA", px_list=[5.0, 4.7, 4.3, 3.9, 3.87],
              tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"], spot_days=0,
              swap_type=SwapTypes.PAY,
              fixed_dcc_type=DayCountTypes.ACT_365F,
              fixed_freq_type=FrequencyTypes.ANNUAL,
              float_freq_type=FrequencyTypes.ANNUAL,
              float_dc_type=DayCountTypes.ACT_365F,
              bus_day_type=BusDayAdjustTypes.MODIFIED_FOLLOWING,
              interp_type=InterpTypes.FLAT_FWD_RATES)
m.build_fx(["GBPUSD"], [1.27])
m.build_xccy_curve(name="GBP_USD_BASIS",
                   domestic_curve_name="USD_OIS_SOFR",
                   foreign_curve_name="GBP_OIS_SONIA",
                   basis_spreads=[-5.0, -8.0, -11.0],
                   tenor_list=["1Y", "5Y", "10Y"],
                   spot_fx=1.27,
                   bus_day_type=BusDayAdjustTypes.MODIFIED_FOLLOWING,
                   interp_type=InterpTypes.FLAT_FWD_RATES)
xc = m.curves.GBP_USD_BASIS
out["xccy_curve"] = {
    "times": np.asarray(xc._times, dtype=float).tolist(),
    "dfs": np.asarray(xc._dfs, dtype=float).tolist(),
}

swap = XccyBasisSwap(
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
engine = Engine(m)
res = engine.compute(swap, [RequestTypes.VALUE, RequestTypes.DELTA])
risk = res.risk
ladders = {}
for ct in [CurveTypes.USD_OIS_SOFR, CurveTypes.GBP_OIS_SONIA,
           CurveTypes.USD_GBP_BASIS]:
    try:
        d = risk(ct)
        ladders[ct.name] = np.asarray(d.risk_ladder, dtype=float).tolist()
    except Exception as e:
        ladders[ct.name] = f"error: {e}"
out["xccy_swap"] = {"value": float(res.value.amount),
                    "currency": res.value.currency.name,
                    "deltas": ladders}

# --- inflation: same config as tests/test_inflation.py -------------------
m2 = Model(VALUE_DT)
m2.build_curve(name="GBP_OIS_SONIA",
               px_list=[5.19, 5.04, 4.71, 4.35, 4.13, 3.93, 3.87, 3.87,
                        3.88, 3.71],
               tenor_list=["1M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y",
                           "10Y", "20Y", "30Y"], spot_days=0,
               swap_type=SwapTypes.PAY,
               fixed_dcc_type=DayCountTypes.ACT_365F,
               fixed_freq_type=FrequencyTypes.ANNUAL,
               float_freq_type=FrequencyTypes.ANNUAL,
               float_dc_type=DayCountTypes.ACT_365F,
               bus_day_type=BusDayAdjustTypes.MODIFIED_FOLLOWING,
               interp_type=InterpTypes.LINEAR_ZERO_RATES)

BASE_CPI = 293.0
index = InflationIndex(index_type=InflationIndexTypes.UK_RPI,
                       base_date=VALUE_DT.add_months(-3),
                       base_index=BASE_CPI,
                       currency=CurrencyTypes.GBP,
                       lag_months=3)
BE_TENORS = ["1Y", "2Y", "3Y", "5Y", "10Y", "20Y", "30Y"]
BE_RATES = [3.8, 3.6, 3.5, 3.4, 3.5, 3.45, 3.3]
zcis_list = [ZeroCouponInflationSwap(
    effective_dt=VALUE_DT, term_dt_or_tenor=t, fixed_leg_type=SwapTypes.PAY,
    fixed_rate=px / 100.0, inflation_index=index)
    for t, px in zip(BE_TENORS, BE_RATES)]
# the reference's own type check rejects its None default for
# discount_curve, so pass the OIS curve (it is unused in calibration)
ois_curve = m2.curves.GBP_OIS_SONIA
infl = InflationCurve(value_dt=VALUE_DT, zcis_instruments=zcis_list,
                      base_cpi=BASE_CPI, currency=CurrencyTypes.GBP,
                      index_type=InflationIndexTypes.UK_RPI,
                      discount_curve=ois_curve,
                      check_refit=True)
index.set_inflation_curve(infl)
m2._curves_dict["GBP_RPI_INFLATION"] = infl

out["inflation_curve"] = {
    "times": np.asarray(infl._times, dtype=float).tolist(),
    "factors": np.asarray(infl._dfs, dtype=float).tolist(),
}

zcis = ZeroCouponInflationSwap(
    effective_dt=VALUE_DT, term_dt_or_tenor="5Y",
    fixed_leg_type=SwapTypes.PAY, fixed_rate=0.034,
    inflation_index=index, notional=10_000_000)
out["zcis"] = {"value": float(zcis.value(VALUE_DT, ois_curve, infl))}

yoy = YoYInflationSwap(
    effective_dt=VALUE_DT, term_dt_or_tenor="5Y",
    fixed_leg_type=SwapTypes.PAY, fixed_rate=0.034,
    inflation_index=index, freq_type=FrequencyTypes.ANNUAL,
    notional=10_000_000)
engine2 = Engine(m2)
res2 = engine2.compute(yoy, [RequestTypes.VALUE, RequestTypes.DELTA])
yoy_ladders = {}
for ct in [CurveTypes.GBP_OIS_SONIA, CurveTypes.GBP_RPI_INFLATION]:
    try:
        d = res2.risk(ct)
        yoy_ladders[ct.name] = np.asarray(d.risk_ladder,
                                          dtype=float).tolist()
    except Exception as e:
        yoy_ladders[ct.name] = f"error: {e}"
out["yoy"] = {"value": float(res2.value.amount), "deltas": yoy_ladders}

print(json.dumps(out, indent=1))
