"""Persistent XLA compile cache + warmup — the package-level story for
the flagship's cold-compile cost (VERDICT round-2 item 8).

The 100k-book gamma program is the largest compile in the package
(~2 minutes through a remote-compile TPU service). Nothing about that
cost is per-process: XLA's persistent compilation cache replays the
executable byte-for-byte, so the SECOND process to price the flagship
pays milliseconds. The cache setup lived in bench.py in round 2; it
belongs to the library.

Usage:
    import adrates_tpu
    adrates_tpu.configure_cache()            # default dir, or pass one
    fn = adrates_tpu.parallel.warmup_multibook(mb, n_scenarios=100)

Environment variables honored (same knobs, no code):
    JAX_COMPILATION_CACHE_DIR            cache directory
    ADRATES_CACHE_DIR                    ours; lower precedence than JAX's
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "adrates_tpu", "xla")


def configure_cache(cache_dir: Optional[str] = None,
                    min_compile_secs: float = 1.0) -> str:
    """Enable JAX's persistent compilation cache for every program this
    package (or anything else in the process) compiles.

    Precedence: explicit argument > JAX_COMPILATION_CACHE_DIR >
    ADRATES_CACHE_DIR > ~/.cache/adrates_tpu/xla. Returns the directory
    in use. Safe to call more than once."""
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.environ.get("ADRATES_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
