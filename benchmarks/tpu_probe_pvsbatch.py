"""Time the PV sweep alone at different scenario batch sizes."""

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
    from adrates_tpu.parallel.multibook import (_combine_rows,
                                                _device_expand, trade_pvs)
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    trades = bench.build_base_trades(m, rng)
    mb = compile_multibook(trades, m, base_currency=CurrencyTypes.USD,
                           n_buckets=4)
    n = -(-100_000 // len(trades))
    mbb = tile_multibook(mb, n,
                         notional_scale=rng.uniform(0.5, 2.0, n))
    basket = mbb.basket
    grids = basket.grids
    params = jax.device_put(basket.params)
    clamp0 = jax.device_put(mbb.clamp) if mbb.clamp is not None else None
    bks, cl = _device_expand(jax.device_put(mbb.buckets), clamp0, mbb.tile)
    n_trades = mbb.n_trades
    N = basket.n_quotes
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (100, N)))

    def make(batch):
        @jax.jit
        def pvs_fn(qvec, P, b, c, sh):
            combined = [_combine_rows(bb) for bb in b]

            def grid(shock):
                return grids(qvec + shock, P)

            dfs_all = jax.vmap(grid)(sh)
            return lax.map(
                lambda d: trade_pvs(d, b, c, n_trades, combined),
                dfs_all, batch_size=min(batch, sh.shape[0]))
        return pvs_fn

    for batch in [32, 100]:
        fn = make(batch)
        log(f"batch={batch}: compile")
        t0 = time.time()
        p = fn(q0, params, bks, cl, shocks)
        log(f"batch={batch} compile+run {time.time()-t0:.1f}s "
            f"sum={float(jnp.sum(p)):.6e}")
        t0 = time.time()
        p = fn(q0, params, bks, cl, shocks)
        float(jnp.sum(p))
        log(f"batch={batch} warm {(time.time()-t0)*1e3:.0f} ms")

    log("ALL OK")


if __name__ == "__main__":
    main()
