"""Per-region WARM dispatch times for the staged flagship risk pass.

The flagship book pass is five region programs (A fwd+J+delta, B term1,
C1 term2-XCCY, C2 term2-OIS/infl, D add, P pv sweep); bench.py times
only the composed call. This probe dispatches each kept executable
separately with a scalar-fetch barrier to attribute the warm wall.

Uses ADRATES_CACHE_DIR if set so reruns amortize the cold compile.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import adrates_tpu

    root = os.environ.get("ADRATES_CACHE_DIR")
    if root:
        adrates_tpu.configure_cache(root)

    import jax
    import jax.numpy as jnp

    from adrates_tpu.parallel import compile_multibook, tile_multibook, \
        warmup_multibook
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    model = bench.build_model()
    trades, coll = bench.build_base_trades(model, rng)
    mb_base = compile_multibook(trades, model,
                                base_currency=CurrencyTypes.USD,
                                n_buckets=4, collateral_types=coll,
                                stage_buckets="coarse")
    n_copies = -(-100_000 // len(trades))
    mb = tile_multibook(mb_base, n_copies,
                        notional_scale=rng.uniform(0.5, 2.0, n_copies))
    N = mb.basket.n_quotes
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    t0 = time.perf_counter()
    fn = warmup_multibook(mb, S, want_gamma=True, staged=True,
                          parallel=True)
    print(f"warmup: {time.perf_counter() - t0:.1f}s "
          f"compiles={getattr(fn, 'compile_seconds', None)}", flush=True)

    q0 = jnp.asarray(mb.basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))

    import jax.tree_util as jtu

    def fetch(x):
        return float(sum(jnp.sum(v) for v in jtu.tree_leaves(x)))

    # composed pass
    for _ in range(2):
        t0 = time.perf_counter()
        fetch(fn(q0, shocks))
        print(f"composed: {(time.perf_counter() - t0) * 1e3:.0f} ms",
              flush=True)

    # region-by-region (dispatch through the kept executables with the
    # real intermediate values)
    from adrates_tpu.parallel.multibook import _agg_clamp, \
        _device_expand, _trade_row_table

    basket = mb.basket
    params = jax.device_put(basket.params)
    cols = jax.device_put(mb.cols)
    clamp = jax.device_put(mb.clamp) if mb.clamp is not None else None
    agg = jax.device_put(mb.aggregate)
    clamp_agg = _agg_clamp(clamp, mb.tile)
    _, clamp, cols = _device_expand(None, clamp, mb.tile, cols=cols)
    tri = jnp.asarray(_trade_row_table(mb))

    ex = fn.programs
    # regions compile at fn.chunk-scenario shapes; P runs full-S.
    # Region timings below are ONE chunk's dispatch — multiply by
    # ceil(S / chunk) to compare against the composed pass.
    ck = getattr(fn, "chunk", S)
    sc = shocks[:ck]
    a = ex["A"](q0, params, agg, clamp_agg, sc)
    t1 = ex["B"](a["J"], a["dfs"], agg, clamp_agg)
    h2x, v_of = ex["C1"](q0, params, a["g"], a["carry"], sc)
    h2o = ex["C2"](q0, params, a["g"], v_of, sc)
    gam = ex["D"](t1, h2x, h2o)
    dfs_full = jnp.concatenate([a["dfs"]] * (-(-S // ck)))[:S]
    pvs = ex["P"](dfs_full, cols, clamp, agg, tri)
    fetch({"g": gam, "p": pvs})
    print(f"chunk={ck} (per-region times are ONE of {-(-S // ck)} "
          f"chunks; P is full-S)", flush=True)

    def timeit(name, call, *args):
        t0 = time.perf_counter()
        got = fetch(call(*args))
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{name}: {dt:.0f} ms (fetch {got:.3e})", flush=True)

    for _ in range(2):
        timeit("A ", ex["A"], q0, params, agg, clamp_agg, sc)
        timeit("B ", ex["B"], a["J"], a["dfs"], agg, clamp_agg)
        timeit("C1", ex["C1"], q0, params, a["g"], a["carry"], sc)
        timeit("C2", ex["C2"], q0, params, a["g"], v_of, sc)
        timeit("D ", ex["D"], t1, h2x, h2o)
        timeit("P ", ex["P"], dfs_full, cols, clamp, agg, tri)


if __name__ == "__main__":
    main()
