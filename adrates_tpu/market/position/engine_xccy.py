"""XCCY multi-curve risk (full implementation in the XCCY phase)."""
from ...utils.error import LibError


def compute_xccy(engine, derivative, reqs):
    raise LibError("XCCY engine path not yet wired")
