"""Bond / FRN engine paths (full implementation in the credit phase)."""
from ...utils.error import LibError


def compute_bond(engine, derivative, reqs):
    raise LibError("Bond engine path not yet wired")


def compute_frn(engine, derivative, reqs):
    raise LibError("FRN engine path not yet wired")
