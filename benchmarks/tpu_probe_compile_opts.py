"""Measure XLA:TPU compile time of the worst risk component (term2,
the curve-graph Hessian contraction — 246 s baseline) under reduced
compiler effort knobs.

Usage: timeout 1800 python benchmarks/tpu_probe_compile_opts.py
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

    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.multibook import _agg_clamp, aggregate_total

    # NO persistent cache: we are measuring compiles
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(42)
    model = bench.build_model()
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    mb = compile_multibook(trades, model,
                           base_currency=CurrencyTypes.USD, n_buckets=4)
    basket = mb.basket
    grids = basket.grids
    P = jax.device_put(basket.params)
    agg = jax.device_put(mb.aggregate)
    clamp = jax.device_put(mb.clamp) if mb.clamp is not None else None
    cl_agg = _agg_clamp(clamp, mb.tile)
    q0 = jnp.asarray(basket.quotes0)
    log(f"book: N={basket.n_quotes}")

    def term2(q):
        dfs = grids(q, P)
        g = jax.grad(lambda d: aggregate_total(d, agg, cl_agg))(dfs)
        g0 = jax.lax.stop_gradient(g)
        return jax.jacfwd(jax.grad(lambda qq: jnp.dot(g0, grids(qq, P))))(q)

    variants = [
        ("effort-1", {"exec_time_optimization_effort": -1.0}),
        ("mem-1", {"memory_fitting_effort": -1.0}),
        ("both-1", {"exec_time_optimization_effort": -1.0,
                    "memory_fitting_effort": -1.0}),
        ("baseline", None),
    ]
    for name, opts in variants:
        try:
            t0 = time.perf_counter()
            lowered = jax.jit(term2).lower(q0)
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
            t_c = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = compiled(q0)
            val = float(jnp.sum(out))
            t_r = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(compiled(q0)))
            t_w = time.perf_counter() - t0
            log(f"term2[{name}]: compile {t_c:.1f} s, first {t_r:.2f} s, "
                f"warm {t_w:.3f} s (sum {val:.6g})")
        except Exception as e:  # noqa: BLE001
            log(f"term2[{name}]: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
