"""Formatting, date→time conversion, and validation helpers.

Parity: /root/reference/cavour/utils/helpers.py — times_from_dates (154-197),
to_tenor (201-242), convert_sensitivities (70-98), label_to_string /
format_table, check_argument_types (618-636), grid_index, dot products.
"""

from __future__ import annotations

import math
from typing import List, Union

import numpy as np

from .date import Date
from .day_count import DayCount, DayCountTypes
from .error import LibError
from .global_vars import gDaysInYear


def times_from_dates(dt: Union[Date, list],
                     value_dt: Date,
                     day_count_type: DayCountTypes = None):
    """Year fractions of date(s) from the valuation date.

    Scalar in → scalar out; list in → numpy vector out (reference contract,
    helpers.py:154-197).
    """
    if isinstance(value_dt, Date) is False:
        raise LibError("Valuation date is not a Date")

    dc_counter = None if day_count_type is None else DayCount(day_count_type)

    def _one(d):
        if dc_counter is None:
            return (d - value_dt) / gDaysInYear
        return dc_counter.year_frac(value_dt, d)[0]

    if isinstance(dt, Date):
        return _one(dt)
    if isinstance(dt, (list, tuple)) and len(dt) > 0 and \
            isinstance(dt[0], Date):
        return np.array([_one(d) for d in dt])
    if isinstance(dt, np.ndarray):
        raise LibError("You passed an ndarray instead of dates.")
    raise LibError("Discount factor must take dates.")


def to_tenor(x: Union[float, List[float]]) -> Union[str, List[str]]:
    """Year fraction(s) → tenor label(s): '<1M'→weeks, '<1Y'→months,
    otherwise 'NY[ MM]' (reference helpers.py:201-242)."""

    def _one(val: float) -> str:
        val = float(val)
        if val < 1 / 12:
            weeks = math.ceil(val * 365 / 7)
            return f"{weeks}W"
        if val < 1:
            months = max(int(round(val * 12)), 1)
            return f"{months}M"
        years = int(math.floor(val))
        rem_months = int(round((val - years) * 12))
        if rem_months == 12:
            years += 1
            rem_months = 0
        return f"{years}Y" if rem_months == 0 else f"{years}Y{rem_months}M"

    if isinstance(x, (list, tuple, np.ndarray)):
        return [_one(v) for v in x]
    return _one(x)


def convert_sensitivities(df_sens: np.ndarray,
                          times: np.ndarray,
                          dfs: np.ndarray) -> np.ndarray:
    """Convert dPV/dDF sensitivities into zero-rate sensitivities.

    dPV/dr_i = dPV/dDF_i * dDF_i/dr_i with DF = exp(-r t) so
    dDF/dr = -t * DF (reference helpers.py:70-98 semantics).
    """
    df_sens = np.asarray(df_sens, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    dfs = np.asarray(dfs, dtype=np.float64)
    return df_sens * (-times) * dfs


def label_to_string(label: str, value, separator: str = "\n",
                    list_format: bool = False) -> str:
    """Fixed-width "LABEL: value" line used by object __repr__s."""
    label = str(label)
    if list_format and isinstance(value, (list, tuple)):
        body = ", ".join(str(v) for v in value)
    else:
        body = str(value)
    return f"{label:<20}: {body}{separator}"


def format_table(header: List[str], rows: List[list]) -> str:
    """Plain-text table (column-aligned) for cashflow/valuation reports."""
    cols = [str(h) for h in header]
    str_rows = [[str(c) for c in row] for row in rows]
    widths = [len(c) for c in cols]
    for row in str_rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep,
           "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|",
           sep]
    for row in str_rows:
        out.append("|" + "|".join(
            f" {c:<{w}} " for c, w in zip(row, widths)) + "|")
    out.append(sep)
    return "\n".join(out)


def table_to_string(title: str, header: List[str], rows: List[list]) -> str:
    return title + "\n" + format_table(header, rows)


def check_argument_types(func, values: dict) -> None:
    """Annotation-driven runtime type check of a function's arguments.

    Tuple annotations mean "any of these types" (reference convention,
    helpers.py:618-636). Unannotated arguments are not checked.
    """
    if func is None:
        return
    annotations = getattr(func, "__annotations__", {})
    for name, expected in annotations.items():
        if name in ("return",) or name not in values:
            continue
        value = values[name]
        if value is None:
            continue
        if isinstance(expected, tuple):
            ok = any(isinstance(value, e) for e in expected
                     if isinstance(e, type))
            if not ok and any(not isinstance(e, type) for e in expected):
                ok = True  # unresolvable annotation: skip
        elif isinstance(expected, type):
            ok = isinstance(value, expected)
        else:
            ok = True  # string/typing annotations: skip
        if not ok:
            raise LibError(
                f"Argument '{name}' of type {type(value).__name__} is not "
                f"of expected type {expected}")


def grid_index(t: float, grid: np.ndarray, tol: float = 1e-8) -> int:
    """Index of t in grid within tolerance, else -1."""
    grid = np.asarray(grid)
    hits = np.where(np.abs(grid - t) < tol)[0]
    return int(hits[0]) if hits.size else -1


def input_time(dt: Date, curve) -> float:
    """Time from a curve's anchor date to dt in years (ACT/gDaysInYear)."""
    if isinstance(dt, Date):
        t = (dt - curve._value_dt) / gDaysInYear
        if t < 0.0:
            raise LibError("Date before curve value date.")
        return t
    raise LibError("Unknown type.")


def dot_product(x, y) -> float:
    return float(np.dot(np.asarray(x), np.asarray(y)))


def check_vector_differences(x, y, tol: float = 1e-6) -> None:
    x = np.asarray(x)
    y = np.asarray(y)
    if x.shape != y.shape:
        raise LibError("Vectors x and y do not have same size.")
    if np.any(np.abs(x - y) > tol):
        raise LibError("Vectors x and y differ by more than tolerance.")


def _func_name() -> str:
    """Name of the calling function (used for type-check plumbing)."""
    import inspect
    return inspect.stack()[1][3]
