"""Incremental TPU exercise of the multibook path, smallest-first.

Each stage prints BEFORE it starts so a device fault is attributable.
Run in the background and never SIGTERM it mid-stage: killing a client
while the remote TPU is executing can wedge the tunnel.
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

    log("stage 0: backend init")
    log(f"devices: {jax.devices()}")

    log("stage 1: trivial op")
    log(f"sum: {jnp.sum(jnp.arange(8.0)**2)}")

    sys.argv = ["bench"]
    import bench

    log("stage 2: build 10-curve model (host tier)")
    t0 = time.time()
    m = bench.build_model()
    log(f"built in {time.time()-t0:.1f}s")

    from adrates_tpu.parallel import (compile_multibook, make_multibook_fn,
                                      make_per_trade_delta_fn,
                                      tile_multibook)
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    trades = bench.build_base_trades(m, rng)

    log("stage 3: compile 170-trade multibook")
    t0 = time.time()
    mb = compile_multibook(trades, m, base_currency=CurrencyTypes.USD,
                           n_buckets=4)
    log(f"compiled in {time.time()-t0:.1f}s; N={mb.basket.n_quotes}")

    N = mb.basket.n_quotes
    q0 = jnp.asarray(mb.basket.quotes0)
    s1 = jnp.asarray(rng.normal(0.0, 1e-3, (1, N)))

    log("stage 4: small book, delta-only, S=1")
    t0 = time.time()
    fn_d = make_multibook_fn(mb, want_gamma=False)
    out = fn_d(q0, s1)
    jax.block_until_ready(out)
    log(f"ok in {time.time()-t0:.1f}s; pv0={float(out['pvs'][0,0]):.4f} "
        f"delta finite={bool(np.isfinite(np.asarray(out['delta'])).all())}")

    log("stage 5: small book, gamma, S=1")
    t0 = time.time()
    fn_g = make_multibook_fn(mb, want_gamma=True)
    out = fn_g(q0, s1)
    jax.block_until_ready(out)
    log(f"ok in {time.time()-t0:.1f}s; "
        f"gamma finite={bool(np.isfinite(np.asarray(out['gamma'])).all())}")

    log("stage 6: small book, gamma, S=4")
    s4 = jnp.asarray(rng.normal(0.0, 1e-3, (4, N)))
    t0 = time.time()
    out = fn_g(q0, s4)
    jax.block_until_ready(out)
    log(f"ok in {time.time()-t0:.1f}s")

    log("stage 7: per-trade delta ladders (small book)")
    t0 = time.time()
    lad = make_per_trade_delta_fn(mb, chunk=4096)(q0)
    jax.block_until_ready(lad)
    log(f"ok in {time.time()-t0:.1f}s; shape={lad.shape}")

    log("stage 8: tile to 100k")
    n_copies = -(-100_000 // len(trades))
    mb_big = tile_multibook(mb, n_copies,
                            notional_scale=rng.uniform(0.5, 2.0, n_copies))
    log(f"tiled to {mb_big.n_trades}")

    log("stage 9: 100k book, gamma, S=1")
    fn_big = make_multibook_fn(mb_big, want_gamma=True)
    t0 = time.time()
    out = fn_big(q0, s1)
    jax.block_until_ready(out)
    log(f"ok in {time.time()-t0:.1f}s")

    log("stage 10: 100k book, gamma, S=100 (compile+run)")
    s100 = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))
    t0 = time.time()
    out = fn_big(q0, s100)
    jax.block_until_ready(out)
    log(f"compile+run in {time.time()-t0:.1f}s")

    t0 = time.time()
    out = fn_big(q0, s100)
    jax.block_until_ready(out)
    dt = time.time() - t0
    log(f"warm run {dt*1e3:.0f} ms -> "
        f"{mb_big.n_trades*100/dt:,.0f} trade-scenarios/sec")

    log("ALL STAGES OK")


if __name__ == "__main__":
    main()
