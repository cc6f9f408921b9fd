"""Inflation swap engine paths (full implementation in the inflation phase)."""
from ...utils.error import LibError


def compute_zcis(engine, derivative, reqs):
    raise LibError("ZCIS engine path not yet wired")


def compute_yoy_iis(engine, derivative, reqs):
    raise LibError("YoY inflation engine path not yet wired")
