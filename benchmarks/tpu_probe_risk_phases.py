"""Bisect the flagship risk pass on TPU: time J-only, +term1, +term2
variants at S=100 so optimization effort lands where the milliseconds
are (VERDICT r2: flagship must go <1s; risk pass measured 3060 ms).

Usage: timeout 3000 python benchmarks/tpu_probe_risk_phases.py [S]
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
    from adrates_tpu.parallel.multibook import (_agg_clamp,
                                                _gamma_quad_form,
                                                aggregate_total)

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
    CU = mb.basket.n_curves * mb.unique_times.shape[0]
    log(f"book: {mb.n_trades} trades, N={N}, CU={CU}")

    q0 = jnp.asarray(mb.basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))

    grids = mb.basket.grids
    params = jax.device_put(mb.basket.params)
    agg = jax.device_put(mb.aggregate)
    clamp_agg = _agg_clamp(
        jax.device_put(mb.clamp) if mb.clamp is not None else None,
        mb.tile)
    risk_batch = max(1, min(int(1e8 // max(N * CU, 1)), 64))
    log(f"risk_batch={risk_batch}")

    def run(name, one_scenario):
        @jax.jit
        def f(qvec, P, ag, cl, sh):
            return lax.map(one_scenario, sh,
                           batch_size=min(risk_batch, sh.shape[0]))
        t0 = time.perf_counter()
        out = f(q0, params, agg, clamp_agg, shocks)
        tot = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f} s "
            f"(sum {tot:.4g})")
        t0 = time.perf_counter()
        out = f(q0, params, agg, clamp_agg, shocks)
        tot = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: warm {(time.perf_counter()-t0)*1e3:.0f} ms")

    def forward_only(shock):
        dfs = grids(q0 + shock, params)
        return {"total": aggregate_total(dfs, agg, clamp_agg)}

    def grad_only(shock):
        dfs = grids(q0 + shock, params)
        g = jax.grad(lambda d: aggregate_total(d, agg, clamp_agg))(dfs)
        return {"g": jnp.sum(g)}

    def j_only(shock):
        q = q0 + shock
        dfs, jvp_fn = jax.linearize(lambda qq: grids(qq, params), q)
        J = jax.vmap(jvp_fn)(jnp.eye(N, dtype=q.dtype))
        g = jax.grad(lambda d: aggregate_total(d, agg, clamp_agg))(dfs)
        return {"delta": J @ g}

    def j_term1(shock):
        q = q0 + shock
        dfs, jvp_fn = jax.linearize(lambda qq: grids(qq, params), q)
        J = jax.vmap(jvp_fn)(jnp.eye(N, dtype=q.dtype))
        g = jax.grad(lambda d: aggregate_total(d, agg, clamp_agg))(dfs)
        t1 = _gamma_quad_form(J, dfs, agg, clamp_agg)
        return {"delta": J @ g, "t1": t1}

    def term2_only(shock):
        q = q0 + shock
        dfs = grids(q, params)
        g = jax.grad(lambda d: aggregate_total(d, agg, clamp_agg))(dfs)
        g0 = lax.stop_gradient(g)
        t2 = jax.jacfwd(
            jax.grad(lambda qq: jnp.dot(g0, grids(qq, params))))(q)
        return {"t2": t2}

    run("forward only (curve graph + aggregate)", forward_only)
    run("forward + g (one reverse)", grad_only)
    run("J + delta (N-tangent jacfwd)", j_only)
    run("J + delta + term1 (quad form)", j_term1)
    run("term2 alone (jacfwd over grad)", term2_only)


if __name__ == "__main__":
    main()
