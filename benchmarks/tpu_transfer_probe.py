"""Laddered host->device transfer probe for the tunneled TPU.

Prints before each step so a wedge/crash is attributable to a size.
"""

import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("init")
    log(f"devices: {jax.devices()}")

    log("op: sum(arange(8))")
    log(f"-> {jnp.sum(jnp.arange(8.0)):.1f}")

    for mb in [1, 4, 16, 64, 128, 256, 512]:
        n = mb * 1024 * 1024 // 8
        x = np.arange(n, dtype=np.float64)
        log(f"device_put {mb} MB f64")
        t0 = time.time()
        d = jax.device_put(x)
        d.block_until_ready()
        dt = time.time() - t0
        log(f"-> ok in {dt:.2f}s ({mb/dt:.0f} MB/s)")
        log(f"reduce on device: {float(jnp.sum(d)):.3e}")
        del d, x

    log("ALL TRANSFERS OK")


if __name__ == "__main__":
    main()
