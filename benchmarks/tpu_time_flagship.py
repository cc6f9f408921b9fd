"""Honest flagship timing: forces completion via scalar fetches.

block_until_ready appears to return early under the tunneled axon
backend; fetching a reduced scalar to host is ground truth (it cannot
arrive before the computation finishes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/adrates_jax_cache")
    except Exception:
        pass

    sys.argv = ["bench"]
    import bench

    log(f"devices: {jax.devices()}")
    log("build model")
    m = bench.build_model()

    from adrates_tpu.parallel import (compile_multibook, make_multibook_fn,
                                      tile_multibook)
    from adrates_tpu.utils import CurrencyTypes

    materialize = os.environ.get("FLAGSHIP_MATERIALIZE") == "1"
    want_gamma = os.environ.get("FLAGSHIP_NO_GAMMA") != "1"
    rng = np.random.default_rng(7)
    trades = bench.build_base_trades(m, rng)
    mb = compile_multibook(trades, m, base_currency=CurrencyTypes.USD,
                           n_buckets=4)
    n_copies = -(-100_000 // len(trades))
    mbb = tile_multibook(mb, n_copies,
                         notional_scale=rng.uniform(0.5, 2.0, n_copies),
                         materialize=materialize)
    log(f"book: {mbb.n_trades} trades, N={mb.basket.n_quotes}, "
        f"materialize={materialize}, want_gamma={want_gamma}")

    N = mb.basket.n_quotes
    q0 = jnp.asarray(mb.basket.quotes0)
    s100 = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))

    fn = make_multibook_fn(mbb, want_gamma=want_gamma)

    log("compile S=100 (lazy book)")
    t0 = time.time()
    out = fn(q0, s100)
    chk = float(sum(jnp.sum(v) for v in out.values()))
    log(f"compile+run+fetch {time.time()-t0:.1f}s  check={chk:.6e}")

    for i in range(3):
        t0 = time.time()
        out = fn(q0, s100)
        chk = float(sum(jnp.sum(v) for v in out.values()))
        dt = time.time() - t0
        log(f"warm iter {i}: {dt*1e3:.0f} ms (scalar-fetch) "
            f"-> {mbb.n_trades*100/dt:,.0f} trade-scenarios/sec")

    # contrast: the block_until_ready timing (suspected broken)
    t0 = time.time()
    out = fn(q0, s100)
    jax.block_until_ready(out)
    log(f"block_until_ready timing: {(time.time()-t0)*1e3:.0f} ms")
    t0 = time.time()
    _ = np.asarray(out["delta"][0, 0])
    log(f"...then one-element fetch: {(time.time()-t0)*1e3:.0f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
