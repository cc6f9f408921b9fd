"""Model.build_xccy_curve implementation.

API parity with /root/reference/cavour/models/models.py:267-391; the
"domestic" curve is the collateral currency's OIS curve, "foreign" the
other. spot_fx is quoted DOMESTIC per FOREIGN (e.g. domestic=USD,
foreign=GBP, spot_fx = GBPUSD = 1.3468 USD per GBP) — one convention
everywhere, unlike the reference (models.py:369 inverts it on the way in).
"""

from __future__ import annotations

from typing import List

from ..trades.rates.xccy_basis_swap import XccyBasisSwap
from ..trades.rates.xccy_curve import XccyCurve
from ..utils.calendar import BusDayAdjustTypes, CalendarTypes
from ..utils.currency import CurrencyTypes
from ..utils.day_count import DayCountTypes
from ..utils.frequency import FrequencyTypes
from ..utils.global_types import CurveTypes, InterpTypes


def build_xccy_curve(model,
                     name: str,
                     domestic_curve_name: str,
                     foreign_curve_name: str,
                     basis_spreads: List[float],
                     tenor_list: List[str],
                     spot_fx: float,
                     domestic_notional: float = 100_000_000,
                     domestic_freq_type: FrequencyTypes =
                     FrequencyTypes.ANNUAL,
                     foreign_freq_type: FrequencyTypes =
                     FrequencyTypes.ANNUAL,
                     domestic_dc_type: DayCountTypes = DayCountTypes.ACT_360,
                     foreign_dc_type: DayCountTypes = DayCountTypes.ACT_365F,
                     bus_day_type: BusDayAdjustTypes =
                     BusDayAdjustTypes.MODIFIED_FOLLOWING,
                     interp_type: InterpTypes = InterpTypes.FLAT_FWD_RATES,
                     check_refit: bool = True,
                     use_ad: bool = True) -> XccyCurve:
    """Bootstrap a foreign-in-domestic-collateral curve from basis spreads
    (quoted in bp) and register it on the model under ``name``."""
    if domestic_curve_name not in model._curves_dict:
        raise ValueError(
            f"Domestic curve '{domestic_curve_name}' not found in model. "
            f"Build it first using build_curve() or prebuilt_curve().")
    if foreign_curve_name not in model._curves_dict:
        raise ValueError(
            f"Foreign curve '{foreign_curve_name}' not found in model. "
            f"Build it first using build_curve() or prebuilt_curve().")

    domestic_curve = model._curves_dict[domestic_curve_name]
    foreign_curve = model._curves_dict[foreign_curve_name]

    domestic_currency = CurrencyTypes[domestic_curve_name.split("_")[0]]
    foreign_currency = CurrencyTypes[foreign_curve_name.split("_")[0]]
    domestic_index = CurveTypes[domestic_curve_name]
    foreign_index = CurveTypes[foreign_curve_name]

    foreign_notional = domestic_notional / spot_fx

    basis_swaps = []
    for tenor, spread_bps in zip(tenor_list, basis_spreads):
        basis_swaps.append(XccyBasisSwap(
            effective_dt=model.value_dt,
            term_dt_or_tenor=tenor,
            domestic_notional=domestic_notional,
            foreign_notional=foreign_notional,
            domestic_spread=0.0,
            foreign_spread=spread_bps / 10000.0,
            domestic_freq_type=domestic_freq_type,
            foreign_freq_type=foreign_freq_type,
            domestic_dc_type=domestic_dc_type,
            foreign_dc_type=foreign_dc_type,
            domestic_floating_index=domestic_index,
            foreign_floating_index=foreign_index,
            domestic_currency=domestic_currency,
            foreign_currency=foreign_currency,
            domestic_bd_type=bus_day_type,
            foreign_bd_type=bus_day_type))

    xccy_curve = XccyCurve(
        value_dt=model.value_dt,
        basis_swaps=basis_swaps,
        domestic_curve=domestic_curve,
        foreign_curve=foreign_curve,
        spot_fx=spot_fx,
        interp_type=interp_type,
        check_refit=check_refit,
        use_ad=use_ad)
    xccy_curve._domestic_index = domestic_index
    xccy_curve._foreign_index = foreign_index

    model._curves_dict[name] = xccy_curve
    model._curve_params_dict[name] = {
        "domestic_curve_name": domestic_curve_name,
        "foreign_curve_name": foreign_curve_name,
        "basis_spreads": list(basis_spreads),
        "tenor_list": list(tenor_list),
        "spot_fx": spot_fx,
        "domestic_notional": domestic_notional,
        "domestic_freq_type": domestic_freq_type,
        "foreign_freq_type": foreign_freq_type,
        "domestic_dc_type": domestic_dc_type,
        "foreign_dc_type": foreign_dc_type,
        "bus_day_type": bus_day_type,
        "interp_type": interp_type,
        "use_ad": use_ad,
    }
    return xccy_curve
