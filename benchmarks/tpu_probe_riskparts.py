"""Decompose flagship cost: grids-only, delta-only, full risk, sweep@48."""

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
    n = -(-100_000 // len(trades))
    mbb = tile_multibook(mb, n, notional_scale=rng.uniform(0.5, 2.0, n))
    basket = mbb.basket
    grids = basket.grids
    params = jax.device_put(basket.params)
    agg = jax.device_put(mbb.aggregate)
    clamp0 = jax.device_put(mbb.clamp) if mbb.clamp is not None else None
    cl_agg = _agg_clamp(clamp0, mbb.tile)
    N = basket.n_quotes
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))

    def timed_call(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        chk = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name} compile+run {time.time()-t0:.1f}s chk={chk:.4e}")
        t0 = time.time()
        out = fn(*args)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name} warm {(time.time()-t0)*1e3:.0f} ms")

    @jax.jit
    def grids_only(qvec, P, sh):
        return jax.vmap(lambda s: grids(qvec + s, P))(sh)

    timed_call("grids-only S=100", grids_only, q0, params, shocks)

    @jax.jit
    def delta_only(qvec, P, sh):
        def one(shock):
            total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)
            return jax.jacrev(total)(qvec + shock)
        return jax.vmap(one)(sh)

    timed_call("delta-only S=100", delta_only, q0, params, shocks)

    @jax.jit
    def gamma_only(qvec, P, sh):
        def one(shock):
            total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)
            return jax.jacfwd(jax.jacrev(total))(qvec + shock)
        return jax.vmap(one)(sh)

    timed_call("gamma-only S=100", gamma_only, q0, params, shocks)

    bks, cl = _device_expand(jax.device_put(mbb.buckets), clamp0, mbb.tile)
    n_trades = mbb.n_trades

    @jax.jit
    def sweep48(qvec, P, b, c, sh):
        combined = [_combine_rows(bb) for bb in b]
        dfs_all = jax.vmap(lambda s: grids(qvec + s, P))(sh)
        return lax.map(
            lambda d: trade_pvs(d, b, c, n_trades, combined),
            dfs_all, batch_size=48)

    timed_call("sweep batch=48 S=100", sweep48, q0, params, bks, cl,
               shocks)

    log("ALL OK")


if __name__ == "__main__":
    main()
