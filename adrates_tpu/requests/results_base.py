"""Result-class foundations: base ABC + capability mixins.

Parity: /root/reference/cavour/requests/results_base.py:22-376 (BaseResult,
ArithmeticMixin, ExportMixin, VisualizationMixin, AggregationMixin,
ValidationMixin).
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import numpy as np


class BaseResult(ABC):
    """Abstract base for all analytics result containers."""

    @abstractmethod
    def to_dict(self) -> Dict[str, Any]:
        """Dictionary representation of the result."""

    def validate(self) -> bool:
        """Subclasses may override with content checks."""
        return True


class ArithmeticMixin:
    """Currency-checked arithmetic for amount-bearing results."""

    def _check_compatible(self, other):
        if getattr(self, "currency", None) is not getattr(other, "currency",
                                                          None):
            raise ValueError(
                f"Currency mismatch: {getattr(self, 'currency', None)} vs "
                f"{getattr(other, 'currency', None)}")


class ExportMixin:
    """to_json / to_csv / to_excel via the subclass's DataFrame view."""

    def to_json(self, indent: Optional[int] = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=str)

    def to_csv(self, filepath: Optional[str] = None) -> Optional[str]:
        df = self.df
        if filepath:
            df.to_csv(filepath)
            return None
        return df.to_csv()

    def to_excel(self, filepath: str, sheet_name: str = "Result"):
        self.df.to_excel(filepath, sheet_name=sheet_name)


class VisualizationMixin:
    """plot() hook — plotly is optional; raise a clear error if absent."""

    def plot(self, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} does not define a plot")


class AggregationMixin:
    """Totals over amount collections."""

    @property
    def total_amount(self) -> float:
        return float(sum(getattr(cf, "amount", 0.0)
                         for cf in getattr(self, "_items", [])))

    @property
    def total_pv(self) -> float:
        return float(sum(getattr(cf, "discounted_amount", 0.0)
                         for cf in getattr(self, "_items", [])))


class ValidationMixin:
    """NaN/Inf/shape/currency validators (results_base.py:288-356)."""

    @staticmethod
    def validate_no_nan(arr, name: str = "array") -> None:
        a = np.asarray(arr, dtype=float)
        if np.any(np.isnan(a)):
            raise ValueError(f"{name} contains NaN values")

    @staticmethod
    def validate_no_inf(arr, name: str = "array") -> None:
        a = np.asarray(arr, dtype=float)
        if np.any(np.isinf(a)):
            raise ValueError(f"{name} contains Inf values")

    @staticmethod
    def validate_finite(arr, name: str = "array") -> None:
        ValidationMixin.validate_no_nan(arr, name)
        ValidationMixin.validate_no_inf(arr, name)

    @staticmethod
    def validate_shape(arr, expected_shape, name: str = "array") -> None:
        a = np.asarray(arr)
        if a.shape != tuple(expected_shape):
            raise ValueError(
                f"{name} has shape {a.shape}, expected {expected_shape}")

    @staticmethod
    def validate_square(arr, name: str = "matrix") -> None:
        a = np.asarray(arr)
        if a.ndim != 2 or a.shape[0] != a.shape[1]:
            raise ValueError(f"{name} must be square, got {a.shape}")
