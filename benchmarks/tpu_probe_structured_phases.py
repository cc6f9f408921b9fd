"""Bisect the STRUCTURED risk pass on TPU at S=100: delta-only (stage
jvp sweeps + J assembly), +term1 (trip quad form), full (+term2
per-stage hessians). Run after any structured_risk change.

Usage: timeout 3000 python benchmarks/tpu_probe_structured_phases.py [S]
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
    from adrates_tpu.parallel.multibook import _agg_clamp
    from adrates_tpu.parallel.structured_risk import make_structured_risk

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
    params = jax.device_put(mb.basket.params)
    agg = jax.device_put(mb.aggregate)
    clamp_agg = _agg_clamp(
        jax.device_put(mb.clamp) if mb.clamp is not None else None,
        mb.tile)
    struct = make_structured_risk(mb.basket)
    risk_batch = max(1, min(int(1e8 // max(N * CU, 1)), 64))

    def run(name, want_gamma, terms):
        @jax.jit
        def f(qvec, P, ag, cl, sh):
            return lax.map(
                lambda s: struct(qvec + s, P, ag, cl, want_gamma,
                                 terms=terms),
                sh, batch_size=min(risk_batch, sh.shape[0]))
        t0 = time.perf_counter()
        out = f(q0, params, agg, clamp_agg, shocks)
        tot = float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f} s "
            f"(sum {tot:.4g})")
        t0 = time.perf_counter()
        out = f(q0, params, agg, clamp_agg, shocks)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: warm {(time.perf_counter()-t0)*1e3:.0f} ms")

    run("delta only (stage jvps + J)", False, ())
    run("delta + term1", True, ("t1",))
    run("delta + term2", True, ("t2",))
    run("full", True, ("t1", "t2"))


if __name__ == "__main__":
    main()
