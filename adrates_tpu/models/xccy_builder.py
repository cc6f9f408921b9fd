"""XCCY curve building (full implementation in the XCCY phase)."""
from ..utils.error import LibError


def build_xccy_curve(model, *args, **kwargs):
    raise LibError("build_xccy_curve not yet wired")
