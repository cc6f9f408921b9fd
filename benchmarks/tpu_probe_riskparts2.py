"""Piecewise compile-time bisect of the closed-form risk program.

Compiles each AD component of multibook._scenario_risk SEPARATELY on
the real device and reports wall-clock per compile:

  delta  : jacrev of aggregate_total(grids(q))        (round-2 shape)
  J      : vmap(linearize jvp) over N tangents        (the jacobian)
  quad   : _gamma_quad_form given a precomputed J
  term2  : jacfwd(grad(g0 . grids))                   (curve Hessian)
  tower  : jacfwd(jacrev(aggregate_total . grids))    (round-2 gamma)

Usage: timeout 1800 python benchmarks/tpu_probe_riskparts2.py [parts...]
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
    import os

    import jax

    if os.environ.get("ADRATES_PROBE_CPU"):
        # the axon terminal ignores JAX_PLATFORMS; force via config
        # (docs/tpu_f64_notes.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import adrates_tpu
    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.multibook import (_gamma_quad_form,
                                                aggregate_total)

    adrates_tpu.configure_cache("/tmp/adrates_jax_cache")
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(42)
    model = bench.build_model()
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    mb = compile_multibook(trades, model,
                           base_currency=CurrencyTypes.USD, n_buckets=4)
    N = mb.basket.n_quotes
    log(f"book compiled: N={N} T={mb.aggregate.trip_s.shape[0]}")

    basket = mb.basket
    grids = basket.grids
    P = jax.device_put(basket.params)
    agg = jax.device_put(mb.aggregate)
    from adrates_tpu.parallel.multibook import _agg_clamp
    clamp = jax.device_put(mb.clamp) if mb.clamp is not None else None
    cl_agg = _agg_clamp(clamp, mb.tile)
    q0 = jnp.asarray(basket.quotes0)

    def timed(name, f, *a):
        t0 = time.perf_counter()
        out = f(*a)
        val = float(jnp.sum(out))
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f} s "
            f"(sum {val:.6g})")
        t0 = time.perf_counter()
        float(jnp.sum(f(*a)))
        log(f"{name}: warm {time.perf_counter() - t0:.3f} s")
        return out

    parts = sys.argv[1:] or ["delta", "J", "quad", "term2", "tower"]

    total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)

    if "delta" in parts:
        timed("delta", jax.jit(jax.jacrev(total)), q0)

    J_saved = None
    if "J" in parts or "quad" in parts:
        @jax.jit
        def jac(q):
            dfs, jvp = jax.linearize(lambda qq: grids(qq, P), q)
            return jax.vmap(jvp)(jnp.eye(N, dtype=q.dtype))

        J_saved = timed("J", jac, q0)

    if "quad" in parts:
        @jax.jit
        def quad(q, J):
            return _gamma_quad_form(J, grids(q, P), agg, cl_agg)

        timed("quad", quad, q0, J_saved)

    if "term2" in parts:
        @jax.jit
        def term2(q):
            dfs = grids(q, P)
            g = jax.grad(lambda d: aggregate_total(d, agg, cl_agg))(dfs)
            g0 = jax.lax.stop_gradient(g)
            return jax.jacfwd(
                jax.grad(lambda qq: jnp.dot(g0, grids(qq, P))))(q)

        timed("term2", term2, q0)

    if "tower" in parts:
        timed("tower", jax.jit(jax.jacfwd(jax.jacrev(total))), q0)


if __name__ == "__main__":
    main()
