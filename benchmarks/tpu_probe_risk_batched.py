"""Compile + run the REAL flagship book programs on the TPU with the
batched curve graph: _risk at S=100 (closed-form delta+gamma) and the
PV sweep, exactly as bench.py will run them.

Usage: timeout 3000 python benchmarks/tpu_probe_risk_batched.py [S]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import adrates_tpu
    from adrates_tpu.parallel import (compile_multibook, tile_multibook,
                                      warmup_multibook)
    from adrates_tpu.parallel.multibook import make_multibook_fn

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    adrates_tpu.configure_cache("/tmp/adrates_jax_cache")
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    model = bench.build_model()
    log(f"model build: {time.perf_counter()-t0:.1f} s")
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    t0 = time.perf_counter()
    mb_base = compile_multibook(trades, model,
                                base_currency=CurrencyTypes.USD,
                                n_buckets=4)
    n_copies = -(-100_000 // len(trades))
    mb = tile_multibook(mb_base, n_copies,
                        notional_scale=rng.uniform(0.5, 2.0, n_copies))
    N = mb.basket.n_quotes
    log(f"book: {mb.n_trades} trades, N={N} "
        f"({time.perf_counter()-t0:.1f} s)")

    q0 = jnp.asarray(mb.basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))

    t0 = time.perf_counter()
    fn = warmup_multibook(mb, S, want_gamma=True)
    log(f"warmup (compile+first run, S={S}): "
        f"{time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    out = fn(q0, shocks)
    tot = float(sum(jnp.sum(v) for v in out.values()))
    dt = time.perf_counter() - t0
    log(f"warm full flagship (PV sweep + delta + gamma, S={S}): "
        f"{dt*1e3:.0f} ms (sum {tot:.6g}) -> "
        f"{mb.n_trades * S / dt:,.0f} trade-scenarios/sec")
    for k, v in out.items():
        log(f"  {k}: shape {v.shape} nan={int(jnp.sum(jnp.isnan(v)))}")

    # split timing: the two compiled programs separately
    t0 = time.perf_counter()
    r = fn.risk_only(q0, shocks)
    float(sum(jnp.sum(v) for v in r.values()))
    log(f"warm risk pass alone: {(time.perf_counter()-t0)*1e3:.0f} ms")
    t0 = time.perf_counter()
    p = fn.pvs_only(q0, shocks)
    float(jnp.sum(p))
    log(f"warm PV sweep alone: {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
