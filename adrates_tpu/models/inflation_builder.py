"""Inflation curve building (full implementation in the inflation phase)."""
from ..utils.error import LibError


def build_inflation_curve(model, *args, **kwargs):
    raise LibError("build_inflation_curve not yet wired")
