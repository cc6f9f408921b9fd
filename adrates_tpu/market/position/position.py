"""Position: (derivative, model) pair that runs the engine.

Parity: /root/reference/cavour/market/position/position.py:25-81.
"""

from __future__ import annotations

from ...requests.results import AnalyticsResult
from .engine import Engine


class Position:
    """A derivative viewed against a model; computes requested analytics."""

    def __init__(self, derivative, model):
        self.derivative = derivative
        self.model = model
        self._engine = Engine(model)

    def compute(self, request_list, collateral_type=None) -> AnalyticsResult:
        """Run the engine for the requested analytics
        (VALUE/DELTA/GAMMA/CASHFLOWS)."""
        return self._engine.compute(self.derivative, set(request_list),
                                    collateral_type)

    def __repr__(self):
        return (f"Position({self.derivative!r}, "
                f"model@{self.model.value_dt})")
