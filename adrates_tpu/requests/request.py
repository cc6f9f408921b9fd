"""RequestTypes re-export (parity: requests/request.py is a stub in the
reference; the enum lives in utils.global_types)."""
from ..utils.global_types import RequestTypes  # noqa: F401
