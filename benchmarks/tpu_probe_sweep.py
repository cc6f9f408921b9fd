"""PV-sweep variants on TPU at S=100: per-scenario gather sweep vs the
transposed [M, S] row-gather sweep (einsum vs multiply+sum), plus
component timings. Drives where the sweep implementation goes.

Usage: timeout 3000 python benchmarks/tpu_probe_sweep.py [S]
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
    from jax import lax

    import adrates_tpu
    from adrates_tpu.parallel import compile_multibook, tile_multibook
    from adrates_tpu.parallel.multibook import (_device_expand,
                                                _trade_row_table,
                                                _trip_values,
                                                trade_pvs_cols)

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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
    N = mb.basket.n_quotes
    grids = mb.basket.grids
    params = jax.device_put(mb.basket.params)
    cols = jax.device_put(mb.cols)
    clamp = jax.device_put(mb.clamp) if mb.clamp is not None else None
    _, clamp, cols = _device_expand(None, clamp, mb.tile, cols=cols)
    agg = jax.device_put(mb.aggregate)
    tri = jnp.asarray(_trade_row_table(mb))
    n_trades = mb.n_trades

    q0 = jnp.asarray(mb.basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))

    dfs_all = jax.jit(
        lambda q, P, sh: jax.vmap(lambda s: grids(q + s, P))(sh)
    )(q0, params, shocks)
    float(jnp.sum(dfs_all))
    log(f"dfs_all ready {dfs_all.shape}")

    def run(name, f, *args):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out))
        log(f"{name}: warm {(time.perf_counter()-t0)*1e3:.0f} ms")

    # A: per-scenario scatter sweep (round-2 baseline path)
    @jax.jit
    def pvs_scatter(d_all, cbs, cl, ag):
        return lax.map(
            lambda d: trade_pvs_cols(d, cbs, cl, n_trades, ag), d_all,
            batch_size=min(64, d_all.shape[0]))

    # B: per-scenario gather-table sweep
    @jax.jit
    def pvs_gather(d_all, cbs, cl, ag):
        def sweep(d):
            v = jnp.concatenate([d, _trip_values(d, ag)])
            rowpv = jnp.concatenate(
                [jnp.sum(cb.w * v[cb.col_idx], axis=1) for cb in cbs]
                + [jnp.zeros(1, d.dtype)])
            out = jnp.sum(rowpv[tri], axis=1)
            if cl is not None:
                from adrates_tpu.parallel.multibook import _clamp_pvs
                out = out.at[cl.slot_trade].add(_clamp_pvs(d, cl))
            return out
        return lax.map(sweep, d_all, batch_size=min(64, d_all.shape[0]))

    # C: transposed row-gather, multiply+sum reduction
    def make_transposed(reduction):
        @jax.jit
        def pvs_t(d_all, cbs, cl, ag):
            Sn = d_all.shape[0]
            trip_all = jax.vmap(lambda d: _trip_values(d, ag))(d_all)
            vT = jnp.concatenate([d_all, trip_all], axis=1).T
            rowpvs = []
            for cb in cbs:
                R, L = cb.col_idx.shape
                chunk = max(1, min(R, int(2.5e7 // max(L * Sn, 1))))
                pad = (-R) % chunk
                ci, wi = cb.col_idx, cb.w
                if pad:
                    ci = jnp.concatenate(
                        [ci, jnp.zeros((pad, L), ci.dtype)])
                    wi = jnp.concatenate(
                        [wi, jnp.zeros((pad, L), wi.dtype)])

                def one_chunk(args):
                    c, w = args
                    Y = vT[c.reshape(-1)].reshape(c.shape + (Sn,))
                    if reduction == "einsum":
                        return jnp.einsum("rl,rls->rs", w, Y)
                    return jnp.sum(w[:, :, None] * Y, axis=1)

                out = lax.map(one_chunk, (ci.reshape(-1, chunk, L),
                                          wi.reshape(-1, chunk, L)))
                rowpvs.append(out.reshape(-1, Sn)[:R])
            rowpv = jnp.concatenate(
                rowpvs + [jnp.zeros((1, Sn), d_all.dtype)])
            return jnp.sum(rowpv[tri], axis=1).T
        return pvs_t

    run("A per-scenario scatter sweep", pvs_scatter, dfs_all, cols,
        clamp, agg)
    run("B per-scenario gather-table sweep", pvs_gather, dfs_all, cols,
        clamp, agg)
    run("C transposed multiply+sum", make_transposed("mulsum"), dfs_all,
        cols, clamp, agg)
    run("D transposed einsum", make_transposed("einsum"), dfs_all, cols,
        clamp, agg)


if __name__ == "__main__":
    main()
