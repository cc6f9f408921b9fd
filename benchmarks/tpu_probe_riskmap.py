"""Risk-pass structure probe at S=100: batched map vs full vmap.

The plain lax.map(length=100) version crashes the XLA:TPU worker
(suspected full loop unrolling of a known trip count). Try:
  V2: lax.map(..., batch_size=10)  — scan over 10 vmapped chunks
  V1: jax.vmap                      — no loop at all
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
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/adrates_jax_cache")
    except Exception:
        pass

    sys.argv = ["bench"]
    import bench

    log("build model")
    m = bench.build_model()

    from adrates_tpu.parallel import compile_multibook, tile_multibook
    from adrates_tpu.parallel.multibook import (_agg_clamp,
                                                aggregate_total)
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    trades = bench.build_base_trades(m, rng)
    mb = compile_multibook(trades, m, base_currency=CurrencyTypes.USD,
                           n_buckets=4)
    mbb = tile_multibook(mb, -(-100_000 // len(trades)),
                         notional_scale=rng.uniform(0.5, 2.0,
                                                    -(-100_000
                                                      // len(trades))))
    basket = mbb.basket
    grids = basket.grids
    params = jax.device_put(basket.params)
    agg = jax.device_put(mbb.aggregate)
    clamp0 = jax.device_put(mbb.clamp) if mbb.clamp is not None else None
    cl_agg = _agg_clamp(clamp0, mbb.tile)
    N = basket.n_quotes
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))

    def one(qvec, P, shock):
        total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)
        return {"delta": jax.jacrev(total)(qvec + shock),
                "gamma": jax.jacfwd(jax.jacrev(total))(qvec + shock)}

    @jax.jit
    def risk_batched(qvec, P, sh):
        return lax.map(lambda s: one(qvec, P, s), sh, batch_size=10)

    log("V2: lax.map batch_size=10, S=100")
    t0 = time.time()
    out = risk_batched(q0, params, shocks)
    chk = float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"V2 ok: {time.time()-t0:.1f}s chk={chk:.4e}")
    t0 = time.time()
    out = risk_batched(q0, params, shocks)
    float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"V2 warm: {(time.time()-t0)*1e3:.0f} ms")

    @jax.jit
    def risk_vmap(qvec, P, sh):
        return jax.vmap(lambda s: one(qvec, P, s))(sh)

    log("V1: full vmap, S=100")
    t0 = time.time()
    out = risk_vmap(q0, params, shocks)
    chk = float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"V1 ok: {time.time()-t0:.1f}s chk={chk:.4e}")
    t0 = time.time()
    out = risk_vmap(q0, params, shocks)
    float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"V1 warm: {(time.time()-t0)*1e3:.0f} ms")

    log("ALL OK")


if __name__ == "__main__":
    main()
