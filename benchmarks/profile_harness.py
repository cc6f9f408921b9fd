"""Profiling harness: wall-clock + jax.profiler traces per hot kernel.

SURVEY §5 tracing/profiling obligation (the reference has none). Usage:

    python benchmarks/profile_harness.py              # wall-clock table
    python benchmarks/profile_harness.py --trace DIR  # + XLA trace for
                                                      # TensorBoard/Perfetto
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace", default=None,
                        help="directory for a jax.profiler trace")
    parser.add_argument("--trades", type=int, default=100_000)
    parser.add_argument("--scenarios", type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adrates_tpu.utils import (BusDayAdjustTypes, CurrencyTypes,
                                   CurveTypes, Date, DayCountTypes,
                                   FrequencyTypes, SwapTypes)
    from adrates_tpu.models import Model
    from adrates_tpu.ops.bootstrap import bootstrap_ois
    from adrates_tpu.parallel import (aggregate_book, compile_book,
                                      make_book_fn, tile_book)
    from adrates_tpu.trades.rates import OIS

    print(f"backend: {jax.default_backend()}")
    value_dt = Date(1, 1, 2024)
    model = Model(value_dt)
    tenors = ["1M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "15Y",
              "20Y", "30Y", "50Y"]
    rates = [5.19, 5.04, 4.71, 4.35, 4.13, 3.93, 3.87, 3.87, 3.91, 3.88,
             3.71, 3.33]
    model.build_curve("GBP_OIS_SONIA", px_list=rates, tenor_list=tenors,
                      fixed_dcc_type=DayCountTypes.ACT_365F,
                      float_dc_type=DayCountTypes.ACT_365F)
    curve = model.curves.GBP_OIS_SONIA
    r = jnp.asarray(curve.swap_rates)

    rng = np.random.default_rng(0)
    base = [OIS(value_dt, ten,
                SwapTypes.PAY if i % 2 else SwapTypes.RECEIVE,
                float(rng.uniform(0.02, 0.05)), FrequencyTypes.ANNUAL,
                DayCountTypes.ACT_365F, CurveTypes.GBP_OIS_SONIA,
                CurrencyTypes.GBP, notional=1e6,
                float_dc_type=DayCountTypes.ACT_365F,
                bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
            for i, ten in enumerate(["2Y", "5Y", "10Y", "30Y"] * 25)]
    book = tile_book(compile_book(base, value_dt),
                     max(args.trades // len(base), 1))
    agg = aggregate_book(book)
    shocks = jnp.asarray(rng.normal(0, 1e-3, (args.scenarios, r.shape[0])))

    reboot = jax.jit(lambda rr: bootstrap_ois(rr, curve._plan))
    book_fn = make_book_fn(curve._plan, curve._interp_type)

    rows = []
    t, _ = timed(reboot, r)
    rows.append(("bootstrap (12 pillars)", t * 1e3))
    t, _ = timed(book_fn, r, book, agg, shocks, n=5)
    rows.append((f"book {book.num_trades} x {args.scenarios} scen "
                 f"(pv+delta+gamma)", t * 1e3))

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(book_fn(r, book, agg, shocks))
        rows.append((f"trace written to {args.trace}", float("nan")))

    width = max(len(name) for name, _ in rows)
    for name, ms in rows:
        print(f"{name:<{width}}  {ms:10.3f} ms")


if __name__ == "__main__":
    main()
