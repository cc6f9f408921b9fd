"""Locate the NaN in the flagship risk output on the REAL device.

Compiles each component of the closed-form risk split separately and
reports NaN counts. Persistent cache on, so re-runs iterate cheaply.

Usage: timeout 3000 python benchmarks/tpu_probe_nan_bisect.py
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
    from adrates_tpu.parallel import compile_multibook, tile_multibook
    from adrates_tpu.parallel.multibook import (_agg_clamp, _device_expand,
                                                _gamma_quad_form,
                                                aggregate_total,
                                                trade_pvs_cols)

    adrates_tpu.configure_cache("/tmp/adrates_jax_cache")
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(7)
    model = bench.build_model()
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    mb_base = compile_multibook(trades, model,
                                base_currency=CurrencyTypes.USD,
                                n_buckets=4)
    n_copies = -(-100_000 // len(trades))
    mb = tile_multibook(mb_base, n_copies,
                        notional_scale=rng.uniform(0.5, 2.0, n_copies))
    basket = mb.basket
    grids = basket.grids
    P = jax.device_put(basket.params)
    agg = jax.device_put(mb.aggregate)
    clamp = jax.device_put(mb.clamp) if mb.clamp is not None else None
    cl_agg = _agg_clamp(clamp, mb.tile)
    cols = jax.device_put(mb.cols)
    _, clamp_x, cols = _device_expand(None, clamp, mb.tile, cols=cols)
    q0 = jnp.asarray(basket.quotes0)
    N = basket.n_quotes
    shock = jnp.asarray(rng.normal(0.0, 1e-3, (N,)))
    log(f"book: N={N}")

    def nan_report(name, f, *a):
        t0 = time.perf_counter()
        out = f(*a)
        flat = jnp.concatenate([jnp.ravel(o) for o in jax.tree_util
                                .tree_leaves(out)])
        n_nan = int(jnp.sum(jnp.isnan(flat)))
        n_inf = int(jnp.sum(jnp.isinf(flat)))
        s = float(jnp.sum(jnp.where(jnp.isfinite(flat), flat, 0.0)))
        log(f"{name}: nan={n_nan} inf={n_inf} finite_sum={s:.6g} "
            f"({time.perf_counter()-t0:.1f} s incl. compile)")
        return out

    dfs0 = nan_report("grids(q0)", jax.jit(lambda q: grids(q, P)), q0)
    nan_report("grids(q0+shock)", jax.jit(lambda q: grids(q, P)),
               q0 + shock)

    total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)
    nan_report("total", jax.jit(total), q0 + shock)
    g = nan_report("g=grad_dfs(total)", jax.jit(lambda q: jax.grad(
        lambda d: aggregate_total(d, agg, cl_agg))(grids(q, P))),
        q0 + shock)

    @jax.jit
    def jac(q):
        dfs, jvp = jax.linearize(lambda qq: grids(qq, P), q)
        return jax.vmap(jvp)(jnp.eye(N, dtype=q.dtype))

    J = nan_report("J", jac, q0 + shock)

    @jax.jit
    def quad(q, Jm):
        return _gamma_quad_form(Jm, grids(q, P), agg, cl_agg)

    nan_report("quad", quad, q0 + shock, J)

    @jax.jit
    def term2(q):
        dfs = grids(q, P)
        gg = jax.grad(lambda d: aggregate_total(d, agg, cl_agg))(dfs)
        g0 = jax.lax.stop_gradient(gg)
        return jax.jacfwd(jax.grad(
            lambda qq: jnp.dot(g0, grids(qq, P))))(q)

    nan_report("term2", term2, q0 + shock)

    @jax.jit
    def pvs(q):
        return trade_pvs_cols(grids(q, P), cols, clamp_x, mb.n_trades,
                              agg)

    nan_report("pvs", pvs, q0 + shock)


if __name__ == "__main__":
    main()
