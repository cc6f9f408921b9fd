"""Bisect the flagship risk-program compile hang (round 3).

The closed-form-split risk program (multibook._scenario_risk) never
finished its warmup compile inside bench.py on the tunneled v5e
(>27 min, round-2's jacfwd∘jacrev tower took 108 s). The program only
depends on the curve graph + aggregate tables (not the book rows), so
probe it at escalating scenario counts on an untiled book and log each
XLA compile (JAX_LOG_COMPILES=1 recommended).

Usage: timeout 1500 python benchmarks/tpu_probe_riskcompile.py [S ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (reuses the flagship model/book builders)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import adrates_tpu
    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.multibook import make_multibook_fn

    adrates_tpu.configure_cache("/tmp/adrates_jax_cache")
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(42)
    model = bench.build_model()
    log("model built")
    trades = bench.build_base_trades(model, rng)
    from adrates_tpu.utils import CurrencyTypes
    mb = compile_multibook(trades, model,
                           base_currency=CurrencyTypes.USD, n_buckets=4)
    N = mb.basket.n_quotes
    T = mb.aggregate.trip_s.shape[0]
    CU = mb.basket.n_curves * mb.unique_times.shape[0]
    log(f"book compiled: trades={mb.n_trades} N={N} T={T} CU={CU}")

    q0 = jnp.asarray(mb.basket.quotes0)
    s_list = [int(a) for a in sys.argv[1:]] or [1, 8, 51, 100]
    for S in s_list:
        shocks = jnp.zeros((S, N))
        fn = make_multibook_fn(mb, want_gamma=True)
        t0 = time.perf_counter()
        out = fn(q0, shocks)
        val = float(sum(jnp.sum(v) for v in out.values()))
        log(f"S={S}: compile+run {time.perf_counter() - t0:.1f} s "
            f"(fetch {val:.6g})")
        t0 = time.perf_counter()
        out = fn(q0, shocks)
        val = float(sum(jnp.sum(v) for v in out.values()))
        log(f"S={S}: warm {time.perf_counter() - t0:.3f} s")


if __name__ == "__main__":
    main()
