"""Count HLO instructions of the curve-graph programs to locate the
compile-time blow-up (round-3 blocker: the closed-form risk program
compiles in 100-270 s per AD pass on the remote TPU service).

Runs on CPU — op counts are backend-independent (pre-optimization
StableHLO), and lowering is fast.

Usage: python benchmarks/hlo_size_probe.py
"""

import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def nops(lowered):
    txt = lowered.as_text()
    # count stablehlo op lines (every "= stablehlo.xxx" or "= chlo.xxx")
    return len(re.findall(r"= \w+\.\w+", txt)), len(txt)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.multibook import (CurveBasket, _agg_clamp,
                                                _gamma_quad_form,
                                                aggregate_total)

    rng = np.random.default_rng(42)
    model = bench.build_model()
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    t0 = time.perf_counter()
    mb = compile_multibook(trades, model,
                           base_currency=CurrencyTypes.USD, n_buckets=4)
    print(f"compile_multibook: {time.perf_counter()-t0:.1f} s")
    basket = mb.basket
    grids = basket.grids
    P = basket.params
    agg = mb.aggregate
    clamp = mb.clamp
    cl_agg = _agg_clamp(clamp, mb.tile)
    q0 = jnp.asarray(basket.quotes0)
    N = basket.n_quotes
    print(f"N={N} curves={basket.n_curves} "
          f"U={mb.unique_times.shape[0]} T={agg.trip_s.shape[0]}")

    def report(name, f, *args):
        t0 = time.perf_counter()
        low = jax.jit(f).lower(*args)
        n, sz = nops(low)
        print(f"{name:22s}: {n:7d} ops  {sz/1e6:6.2f} MB text  "
              f"(lower {time.perf_counter()-t0:.1f} s)")

    # the forward curve graph
    report("grids", lambda q: grids(q, P), q0)

    total = lambda q: aggregate_total(grids(q, P), agg, cl_agg)
    report("total", total, q0)
    report("delta=jacrev(total)", jax.jacrev(total), q0)

    def jac(q):
        dfs, jvp = jax.linearize(lambda qq: grids(qq, P), q)
        return jax.vmap(jvp)(jnp.eye(N, dtype=q.dtype))

    report("J (N-wide jacfwd)", jac, q0)

    def jac1(q):
        dfs, jvp = jax.linearize(lambda qq: grids(qq, P), q)
        return jvp(jnp.ones_like(q))

    report("J (1 tangent)", jac1, q0)

    def term2(q):
        dfs = grids(q, P)
        g = jax.grad(lambda d: aggregate_total(d, agg, cl_agg))(dfs)
        g0 = jax.lax.stop_gradient(g)
        return jax.jacfwd(jax.grad(lambda qq: jnp.dot(g0, grids(qq, P))))(q)

    report("term2", term2, q0)

    # per-curve-kind contribution: baskets with subsets
    names = [s.name for s in basket.specs]
    kinds = {s.name: s.kind for s in basket.specs}
    ois_names = [n for n in names if kinds[n] == "ois"]
    for label, sub in [
        ("1 OIS", ois_names[:1]),
        ("all OIS", ois_names),
        ("OIS+XCCY", [n for n in names if kinds[n] != "infl"]),
        ("all curves", names),
    ]:
        try:
            bsub = CurveBasket(model, curve_names=sub)
        except Exception as e:  # xccy needs its ois deps present
            print(f"basket[{label}]: skipped ({e})")
            continue
        g = bsub.grids_fn(np.asarray(mb.unique_times))
        Ps = bsub.params
        qs = jnp.asarray(bsub.quotes0)
        report(f"grids[{label}]", lambda q, g=g, Ps=Ps: g(q, Ps), qs)
        report(f"jacfwd[{label}]",
               jax.jacfwd(lambda q, g=g, Ps=Ps: g(q, Ps)), qs)


if __name__ == "__main__":
    main()
