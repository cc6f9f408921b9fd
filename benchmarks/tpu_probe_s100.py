"""Isolate which multibook program crashes at S=100 on the big book.

Order: risk-only S=100 (book-size independent) -> pvs-only S=25 ->
pvs-only S=100. Run in background; prints before each step.
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
    from adrates_tpu.parallel.multibook import (_agg_clamp, _combine_rows,
                                                _device_expand,
                                                aggregate_total, trade_pvs)
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    trades = bench.build_base_trades(m, rng)
    mb = compile_multibook(trades, m, base_currency=CurrencyTypes.USD,
                           n_buckets=4)
    n_copies = -(-100_000 // len(trades))
    mbb = tile_multibook(mb, n_copies,
                         notional_scale=rng.uniform(0.5, 2.0, n_copies))
    log(f"lazy book {mbb.n_trades}")

    basket = mbb.basket
    grids = basket.grids
    params = jax.device_put(basket.params)
    agg = jax.device_put(mbb.aggregate)
    clamp0 = jax.device_put(mbb.clamp) if mbb.clamp is not None else None
    cl_agg = _agg_clamp(clamp0, mbb.tile)
    N = basket.n_quotes
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))

    @jax.jit
    def risk(qvec, P, ag, cla, sh):
        def one(shock):
            total = lambda q: aggregate_total(grids(q, P), ag, cla)
            return {"delta": jax.jacrev(total)(qvec + shock),
                    "gamma": jax.jacfwd(jax.jacrev(total))(qvec + shock)}
        return lax.map(one, sh)

    log("A: risk-only S=100 (aggregate graph)")
    t0 = time.time()
    out = risk(q0, params, agg, cl_agg, shocks)
    chk = float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"A ok: {time.time()-t0:.1f}s chk={chk:.4e}")
    t0 = time.time()
    out = risk(q0, params, agg, cl_agg, shocks)
    chk = float(jnp.sum(out["delta"]) + jnp.sum(out["gamma"]))
    log(f"A warm: {(time.time()-t0)*1e3:.0f} ms")

    log("expand book on device")
    bks, cl = _device_expand(jax.device_put(mbb.buckets), clamp0, mbb.tile)
    n_trades = mbb.n_trades

    @jax.jit
    def pvs_fn(qvec, P, b, c, sh):
        combined = [_combine_rows(bb) for bb in b]

        def grid(shock):
            return grids(qvec + shock, P)

        dfs_all = jax.vmap(grid)(sh)
        return lax.map(
            lambda d: trade_pvs(d, b, c, n_trades, combined), dfs_all)

    log("B: pvs-only S=25 (100k book)")
    t0 = time.time()
    p = pvs_fn(q0, params, bks, cl, shocks[:25])
    log(f"B ok: {time.time()-t0:.1f}s sum={float(jnp.sum(p)):.4e}")

    log("C: pvs-only S=100 (100k book)")
    t0 = time.time()
    p = pvs_fn(q0, params, bks, cl, shocks)
    log(f"C ok: {time.time()-t0:.1f}s sum={float(jnp.sum(p)):.4e}")
    t0 = time.time()
    p = pvs_fn(q0, params, bks, cl, shocks)
    log(f"C warm: {(time.time()-t0)*1e3:.0f} ms "
        f"-> {n_trades*100/(time.time()-t0):,.0f} trade-scen/s (pv only)")

    log("ALL OK")


if __name__ == "__main__":
    main()
