"""Latency-tier vs throughput-tier device routing.

TPU-first does NOT mean every op on the TPU. The chip earns its keep on
the batched book/scenario graphs (``parallel/``); curve CONSTRUCTION and
single-trade engine requests are tiny scalar-shaped f64 programs whose
cost on a TPU is dominated by per-program XLA:TPU compilation (~20-40 s
each, one per curve topology) and per-dispatch host<->device latency —
while the same programs compile on the host CPU backend in milliseconds
and run in microseconds, in NATIVE float64. This module routes those two
tiers:

 - build tier  (curve bootstraps, refit gates, curve jacobians)
 - request tier (per-trade Engine.compute analytics)

Both default to the host CPU backend when one is available alongside the
accelerator; the book-scale functions in ``parallel/`` never use these
contexts and always target the default (TPU) backend. Override with
``ADRATES_BUILD_DEVICE`` / ``ADRATES_REQUEST_DEVICE`` set to ``default``
(leave on the default backend, e.g. to measure on-chip calibration —
tests/test_tpu_precision.py drives the raw kernels there directly) or
``host``.

The reference has no equivalent tiering — it is single-device by
construction (SURVEY §2 parallelism checklist).
"""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext
from functools import lru_cache


@lru_cache(maxsize=1)
def host_device():
    """The first host-CPU device, or None when the CPU backend is
    unavailable or IS the default backend (nothing to route)."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None
    if jax.default_backend() == "cpu":
        return None
    return cpu


def _tier_device(env_var: str):
    mode = os.environ.get(env_var, "host").lower()
    if mode == "default":
        return None
    return host_device()


def on_build_device():
    """Context manager: curve-construction compute tier."""
    import jax

    dev = _tier_device("ADRATES_BUILD_DEVICE")
    return jax.default_device(dev) if dev is not None else nullcontext()


def on_request_device():
    """Context manager: per-trade engine-request compute tier."""
    import jax

    dev = _tier_device("ADRATES_REQUEST_DEVICE")
    return jax.default_device(dev) if dev is not None else nullcontext()
