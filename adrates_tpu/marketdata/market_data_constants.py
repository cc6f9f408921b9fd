"""Bloomberg ticker maps and market conventions for prebuilt curves.

Parity: /root/reference/cavour/marketdata/market_data_constants.py:22-235
(GBP SONIA / USD SOFR OIS strips and the GBPUSD SONIA-SOFR basis strip;
ticker identifiers are public Bloomberg symbology).
"""

from ..utils.calendar import BusDayAdjustTypes
from ..utils.day_count import DayCountTypes
from ..utils.frequency import FrequencyTypes
from ..utils.global_types import InterpTypes


def _sonia_tickers():
    month_codes = "ABCDEFGHIJK"
    t = {"1D": "SONIO/N Index", "1W": "BPSWS1Z BGN Curncy",
         "2W": "BPSWS2Z BGN Curncy"}
    for i, code in enumerate(month_codes, start=1):
        t[f"{i}M"] = f"BPSWS{code} BGN Curncy"
    t["1Y"] = "BPSWS1 BGN Curncy"
    t["18M"] = "BPSWS1F BGN Curncy"
    for y in [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15, 20, 25, 30, 40, 50]:
        t[f"{y}Y"] = f"BPSWS{y} BGN Curncy"
    return t


def _sofr_tickers():
    t = {"1D": "SOFRRATE Index"}
    for i, code in zip([1, 2, 3, 4, 5, 6, 9], "ABCDEFI"):
        t[f"{i}M"] = f"USOSFR{code} BGNL Curncy"
    t["1Y"] = "USOSFR1 BGNL Curncy"
    t["18M"] = "USOSFR1F BGNL Curncy"
    for y in [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15, 20, 25, 30, 40, 50]:
        t[f"{y}Y"] = f"USOSFR{y} BGNL Curncy"
    return t


def _gbpusd_basis_tickers():
    t = {"3M": "BPXOQQC BGN Curncy", "6M": "BPXOQQF BGN Curncy",
         "9M": "BPXOQQI BGN Curncy", "1Y": "BPXOQQ1 BGN Curncy",
         "18M": "BPXOQQ1F BGN Curncy"}
    for y in [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15, 20, 25, 30]:
        t[f"{y}Y"] = f"BPXOQQ{y} BGN Curncy"
    return t


MARKET_DATA = {
    "GBP_OIS_SONIA": {
        "tickers": _sonia_tickers(),
        "conventions": {
            "fixed_day_count": DayCountTypes.ACT_365F,
            "fixed_frequency": FrequencyTypes.ANNUAL,
            "business_day_adjustment":
                BusDayAdjustTypes.MODIFIED_FOLLOWING,
            "float_frequency": FrequencyTypes.ANNUAL,
            "float_day_count": DayCountTypes.ACT_365F,
            "interp_type": InterpTypes.LINEAR_ZERO_RATES,
            "payment_lag": 0,
        },
        "currency": "GBP",
        "type": "OIS",
        "index": "SONIA",
    },
    "USD_OIS_SOFR": {
        "tickers": _sofr_tickers(),
        "conventions": {
            "fixed_day_count": DayCountTypes.ACT_360,
            "fixed_frequency": FrequencyTypes.ANNUAL,
            "business_day_adjustment":
                BusDayAdjustTypes.MODIFIED_FOLLOWING,
            "float_frequency": FrequencyTypes.ANNUAL,
            "float_day_count": DayCountTypes.ACT_360,
            "interp_type": InterpTypes.LINEAR_ZERO_RATES,
            "payment_lag": 2,
        },
        "currency": "USD",
        "type": "OIS",
        "index": "SOFR",
    },
    "GBPUSD_XCCY_SONIA_SOFR": {
        "tickers": _gbpusd_basis_tickers(),
        "conventions": {
            # XCCY AD requires flat-forward interpolation in the reference
            # (models.py:423-427); ours works under any scheme but the
            # prebuilt convention is preserved.
            "domestic_day_count": DayCountTypes.ACT_360,
            "foreign_day_count": DayCountTypes.ACT_365F,
            "domestic_frequency": FrequencyTypes.QUARTERLY,
            "foreign_frequency": FrequencyTypes.QUARTERLY,
            "business_day_adjustment":
                BusDayAdjustTypes.MODIFIED_FOLLOWING,
            "interp_type": InterpTypes.FLAT_FWD_RATES,
        },
        "domestic_curve": "USD_OIS_SOFR",
        "foreign_curve": "GBP_OIS_SONIA",
        "fx_pair": "GBPUSD",
        "type": "XCCY",
    },
}

FX_MARKET_DATA = {
    "GBPUSD": {"ticker": "GBPUSD Curncy", "base": "GBP", "quote": "USD"},
    "EURUSD": {"ticker": "EURUSD Curncy", "base": "EUR", "quote": "USD"},
    "EURGBP": {"ticker": "EURGBP Curncy", "base": "EUR", "quote": "GBP"},
    "USDJPY": {"ticker": "USDJPY Curncy", "base": "USD", "quote": "JPY"},
    "USDCHF": {"ticker": "USDCHF Curncy", "base": "USD", "quote": "CHF"},
    "AUDUSD": {"ticker": "AUDUSD Curncy", "base": "AUD", "quote": "USD"},
    "USDCAD": {"ticker": "USDCAD Curncy", "base": "USD", "quote": "CAD"},
}
