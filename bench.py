"""Benchmark: multi-currency book PV + delta + gamma throughput, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md flagship config, incl. config 4's inflation
book): bootstrap 12 curves across 7 currencies (7 OIS + 3 XCCY + 2
inflation), revalue a 100k-trade MIXED book (OIS + XCCY basis swaps +
FRNs incl. capped + bonds + ZCIS + YoY inflation swaps, mixed day counts/
frequencies/pay lags/directions, seasoned and forward-starting trades)
x 100 scenarios with the full cross-curve delta ladder and NxN gamma
(N = every quote on every curve: rates + basis spreads + breakevens)
per scenario.

Baseline: the reference prices ONE swap's PV+delta+gamma in ~40 ms on CPU
(README.md:464-466), i.e. ~25 trade-scenarios/sec.

Secondary numbers (stderr): warm bootstrap, warm single-request latency,
book sweep wall-clock, per-trade-ladder cost.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


MAIN_TENORS = ["1M", "2M", "3M", "4M", "5M", "6M", "7M", "8M", "9M", "10M",
               "11M", "1Y", "18M", "2Y", "3Y", "4Y", "5Y", "6Y", "7Y", "8Y",
               "9Y", "10Y", "12Y", "15Y", "20Y", "25Y", "30Y", "35Y", "40Y",
               "45Y", "50Y", "60Y"]
MAIN_RATES = [5.19, 5.17, 5.15, 5.12, 5.09, 5.04, 4.98, 4.92, 4.87, 4.81,
              4.76, 4.71, 4.51, 4.35, 4.13, 4.00, 3.93, 3.89, 3.87, 3.86,
              3.86, 3.87, 3.89, 3.91, 3.88, 3.80, 3.71, 3.61, 3.51, 3.42,
              3.33, 3.21]
SMALL_TENORS = ["3M", "6M", "1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "15Y",
                "20Y", "30Y", "40Y"]
XCCY_TENORS = ["1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "20Y", "30Y"]


def build_model():
    from adrates_tpu.utils import (Date, DayCountTypes,
                                   InflationIndexTypes, InterpTypes)
    from adrates_tpu.models import Model

    value_dt = Date(1, 1, 2024)
    m = Model(value_dt)

    def shifted(rates, d):
        return [r + d for r in rates]

    small = [MAIN_RATES[MAIN_TENORS.index(t)] for t in SMALL_TENORS]

    def ois(name, px, tenors, dc):
        return lambda: m.build_curve(
            name, px_list=px, tenor_list=tenors, fixed_dcc_type=dc,
            float_dc_type=dc, interp_type=InterpTypes.FLAT_FWD_RATES)

    wave1 = [
        ois("GBP_OIS_SONIA", MAIN_RATES, MAIN_TENORS,
            DayCountTypes.ACT_365F),
        ois("USD_OIS_SOFR", shifted(MAIN_RATES, 0.35), MAIN_TENORS,
            DayCountTypes.ACT_360),
        ois("EUR_OIS_ESTR", shifted(MAIN_RATES, -1.2), MAIN_TENORS,
            DayCountTypes.ACT_360),
    ] + [ois(name, shifted(small, d), SMALL_TENORS, dc)
         for name, d, dc in
         [("JPY_OIS_TONAR", -3.2, DayCountTypes.ACT_365F),
          ("CHF_OIS_SARON", -2.5, DayCountTypes.ACT_360),
          ("AUD_OIS_AONIA", 0.1, DayCountTypes.ACT_365F),
          ("CAD_OIS_CORRA", 0.6, DayCountTypes.ACT_365F)]]

    m.build_fx(["GBPUSD", "EURUSD", "JPYUSD", "CHFUSD", "AUDUSD",
                "CADUSD"],
               [1.27, 1.09, 0.0069, 1.13, 0.66, 0.74])

    def xccy(name, dom, forn, fx, spr):
        return lambda: m.build_xccy_curve(
            name=name, domestic_curve_name=dom, foreign_curve_name=forn,
            basis_spreads=[spr + 0.5 * i
                           for i in range(len(XCCY_TENORS))],
            tenor_list=XCCY_TENORS, spot_fx=fx)

    def infl(name, base_cpi, bes, **kw):
        tl = ["1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "20Y", "30Y"]
        return lambda: m.build_inflation_curve(
            name, base_cpi=base_cpi, breakeven_list=bes,
            tenor_list=tl, **kw)

    # inflation (BASELINE config 4 folded into the flagship): breakevens
    # join the packed quote vector, so the NxN gamma spans rates + basis
    # + inflation. Two waves (XCCY needs its parent OIS curves built):
    # distinct curve topologies' first compiles overlap on the thread
    # pool instead of serializing (Model.build_parallel,
    # test_build_parallel.py parity).
    wave2 = [
        xccy("GBP_USD_XCCY", "USD_OIS_SOFR", "GBP_OIS_SONIA", 1.27,
             -8.0),
        xccy("EUR_USD_XCCY", "USD_OIS_SOFR", "EUR_OIS_ESTR", 1.09,
             -18.0),
        xccy("JPY_USD_XCCY", "USD_OIS_SOFR", "JPY_OIS_TONAR", 0.0069,
             -40.0),
        infl("GBP_RPI_INFLATION", 293.0,
             [3.9, 3.75, 3.6, 3.5, 3.45, 3.5, 3.45, 3.35]),
        infl("USD_CPI_INFLATION", 308.0,
             [2.6, 2.45, 2.4, 2.35, 2.35, 2.4, 2.45, 2.4],
             index_type=InflationIndexTypes.US_CPI_U),
    ]
    m.build_parallel(wave1, wave2)
    return m


def build_base_trades(model, rng):
    """~1,000 DISTINCT base trade topologies (VERDICT r4 missing #4 —
    the headline must be measured at realistic book diversity, not 218
    bases tiled): start dates spread across 4 years with day-of-month
    jitter, mixed day counts, frequencies 1/2/4, pay lags 0/1/2, EOM and
    MF/FOLLOWING adjusts, PAY/RECEIVE, capped FRNs, amortizing bonds,
    cross-currency basis + fix-float + fix-fix swaps, inflation, and OIS
    under FOREIGN collateral (discounted on the in-graph recalibrating
    XCCY curves).

    Returns (trades, collateral_types) — entries of the latter are None
    for natural collateral."""
    from adrates_tpu.utils import (BusDayAdjustTypes, CollateralType,
                                   CurrencyTypes, CurveTypes, Date,
                                   DayCountTypes, FrequencyTypes,
                                   SwapTypes)
    from adrates_tpu.trades.credit import FRN, Bond
    from adrates_tpu.trades.rates import (OIS, XccyBasisSwap, XccyFixFix,
                                          XccyFixFloat)

    value_dt = model.value_dt
    trades = []

    ois_defs = [  # (index, ccy, fixed dc, float dc)
        (CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
         DayCountTypes.ACT_365F, DayCountTypes.ACT_365F),
        (CurveTypes.USD_OIS_SOFR, CurrencyTypes.USD,
         DayCountTypes.ACT_360, DayCountTypes.ACT_360),
        (CurveTypes.EUR_OIS_ESTR, CurrencyTypes.EUR,
         DayCountTypes.THIRTY_E_360, DayCountTypes.ACT_360),
        (CurveTypes.JPY_OIS_TONAR, CurrencyTypes.JPY,
         DayCountTypes.ACT_365F, DayCountTypes.ACT_365F),
        (CurveTypes.AUD_OIS_AONIA, CurrencyTypes.AUD,
         DayCountTypes.ACT_365F, DayCountTypes.ACT_365F),
        (CurveTypes.CAD_OIS_CORRA, CurrencyTypes.CAD,
         DayCountTypes.ACT_365F, DayCountTypes.ACT_365F),
    ]
    tenors = ["1Y", "2Y", "3Y", "5Y", "7Y", "10Y", "15Y", "20Y", "30Y",
              "50Y"]
    freqs = [FrequencyTypes.ANNUAL, FrequencyTypes.SEMI_ANNUAL,
             FrequencyTypes.QUARTERLY]
    bds = [BusDayAdjustTypes.MODIFIED_FOLLOWING,
           BusDayAdjustTypes.FOLLOWING]
    # 48 distinct start dates across ~4 years with day-of-month jitter:
    # every variant lands its schedule on different dates, so unique
    # payment-time count grows with diversity instead of collapsing
    # onto the value date's day-of-month
    month_offsets = [-40, -33, -27, -22, -18, -14, -11, -8, -6, -4,
                     -2, 0, 2, 5, 9, 14]
    starts = [value_dt.add_months(m).add_days(int(d))
              for m in month_offsets for d in (0, 7, 17)]

    i = 0
    for idx, ccy, fdc, ldc in ois_defs:
        for ten in tenors:
            for k in range(12):  # 720 OIS, all topology-distinct
                start = starts[(i * 7 + k) % len(starts)]
                trades.append(OIS(
                    start, ten,
                    SwapTypes.PAY if i % 2 else SwapTypes.RECEIVE,
                    float(rng.uniform(0.01, 0.06)),
                    freqs[i % len(freqs)], fdc, idx, ccy,
                    notional=float(rng.uniform(1e6, 2e7)),
                    float_dc_type=ldc,
                    payment_lag=i % 3,
                    bd_type=bds[k % 2]))
                i += 1

    frn_defs = [(CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                 DayCountTypes.ACT_365F),
                (CurveTypes.USD_OIS_SOFR, CurrencyTypes.USD,
                 DayCountTypes.ACT_360)]
    frn_starts = [value_dt, value_dt.add_months(1).add_days(11),
                  value_dt.add_months(4).add_days(3)]
    for idx, ccy, dc in frn_defs:
        for j, ten in enumerate(["2Y", "3Y", "5Y", "7Y", "10Y", "15Y"]):
            for v in range(5):  # 60 FRNs, 24 capped
                capped = v % 2 == 1
                kwargs = dict(cap_rate=0.055, floor_rate=0.015) \
                    if capped else {}
                trades.append(FRN(
                    frn_starts[v % 3], ten,
                    quoted_margin=float(rng.uniform(0.0005, 0.004)),
                    freq_type=freqs[(j + v) % len(freqs)], dc_type=dc,
                    floating_index=idx, currency=ccy,
                    face_value=float(rng.uniform(1e6, 1e7)), **kwargs))

    xccy_starts = [value_dt, value_dt.add_months(3).add_days(5),
                   value_dt.add_months(9).add_days(13),
                   value_dt.add_months(18)]
    for dom, forn, dom_ccy, for_ccy, fx in [
            (CurveTypes.USD_OIS_SOFR, CurveTypes.GBP_OIS_SONIA,
             CurrencyTypes.USD, CurrencyTypes.GBP, 1.27),
            (CurveTypes.USD_OIS_SOFR, CurveTypes.EUR_OIS_ESTR,
             CurrencyTypes.USD, CurrencyTypes.EUR, 1.09),
            (CurveTypes.USD_OIS_SOFR, CurveTypes.JPY_OIS_TONAR,
             CurrencyTypes.USD, CurrencyTypes.JPY, 0.0069)]:
        for ten in ["2Y", "5Y", "10Y", "20Y", "30Y"]:
            for s in range(4):  # 60 XCCY basis
                dn = float(rng.uniform(5e6, 5e7))
                trades.append(XccyBasisSwap(
                    effective_dt=xccy_starts[s], term_dt_or_tenor=ten,
                    domestic_notional=dn, foreign_notional=dn / fx,
                    domestic_spread=0.0,
                    foreign_spread=float(rng.uniform(-0.002, 0.0)),
                    domestic_freq_type=freqs[2 - s % 2],
                    foreign_freq_type=FrequencyTypes.QUARTERLY,
                    domestic_dc_type=DayCountTypes.ACT_360,
                    foreign_dc_type=DayCountTypes.ACT_365F,
                    domestic_floating_index=dom,
                    foreign_floating_index=forn,
                    domestic_currency=dom_ccy,
                    foreign_currency=for_ccy))

    bond_starts = [value_dt, value_dt.add_months(-31).add_days(9),
                   value_dt.add_months(-9).add_days(21),
                   value_dt.add_months(2)]
    for ccy, dc in [(CurrencyTypes.GBP, DayCountTypes.ACT_365F),
                    (CurrencyTypes.USD, DayCountTypes.THIRTY_360_BOND),
                    (CurrencyTypes.EUR, DayCountTypes.ACT_360)]:
        for j, ten in enumerate(["2Y", "5Y", "7Y", "10Y", "30Y"]):
            for v in range(4):  # 60 bonds, 15 amortizing
                fv = float(rng.uniform(1e6, 1e7))
                freq = (FrequencyTypes.SEMI_ANNUAL if (j + v) % 2
                        else FrequencyTypes.ANNUAL)
                kwargs = {}
                if v == 3:
                    # equal-principal amortizer over coupon periods
                    n_per = int(ten[:-1]) * (
                        2 if freq == FrequencyTypes.SEMI_ANNUAL else 1)
                    kwargs["amortization_schedule"] = \
                        [fv / n_per] * n_per
                trades.append(Bond(
                    bond_starts[v], ten,
                    coupon=float(rng.uniform(0.01, 0.06)),
                    freq_type=freq,
                    dc_type=dc, currency=ccy, face_value=fv, **kwargs))

    # inflation: ZCIS + YoY on both indices (BASELINE config 4)
    from adrates_tpu.trades.rates import (YoYInflationSwap,
                                          ZeroCouponInflationSwap)
    infl_tenors = ["13M", "2Y", "3Y", "4Y", "5Y", "6Y", "7Y", "8Y",
                   "10Y", "12Y", "15Y", "20Y", "30Y"]
    for infl_name in ["GBP_RPI_INFLATION", "USD_CPI_INFLATION"]:
        index = model.curves[infl_name]._used_swaps[0]._inflation_index
        for j, ten in enumerate(infl_tenors):  # 52 inflation
            trades.append(ZeroCouponInflationSwap(
                effective_dt=value_dt, term_dt_or_tenor=ten,
                fixed_leg_type=SwapTypes.PAY if j % 2 else
                SwapTypes.RECEIVE,
                fixed_rate=float(rng.uniform(0.02, 0.04)),
                inflation_index=index,
                notional=float(rng.uniform(1e6, 1e7))))
            trades.append(YoYInflationSwap(
                effective_dt=value_dt, term_dt_or_tenor=ten,
                fixed_leg_type=SwapTypes.RECEIVE if j % 2 else
                SwapTypes.PAY,
                fixed_rate=float(rng.uniform(0.02, 0.04)),
                inflation_index=index,
                freq_type=FrequencyTypes.ANNUAL,
                notional=float(rng.uniform(1e6, 1e7)),
                inflation_spread=float(rng.uniform(-0.001, 0.001))))

    collateral_types = [None] * len(trades)

    # fixed-leg XCCY: fix-float and fix-fix on the calibrated pairs
    # (VERDICT r3 weak #4 — certify the fixed-row + manual-exchange
    # path, multibook.py _rows_for_instrument XCCY fixed branches)
    for dom, forn, dom_ccy, for_ccy, fx in [
            (CurveTypes.USD_OIS_SOFR, CurveTypes.GBP_OIS_SONIA,
             CurrencyTypes.USD, CurrencyTypes.GBP, 1.27),
            (CurveTypes.USD_OIS_SOFR, CurveTypes.EUR_OIS_ESTR,
             CurrencyTypes.USD, CurrencyTypes.EUR, 1.09)]:
        for j, ten in enumerate(["2Y", "5Y", "10Y", "20Y", "30Y"]):
            for s in range(2):  # 20 fix-float
                dn = float(rng.uniform(5e6, 3e7))
                trades.append(XccyFixFloat(
                    effective_dt=xccy_starts[s], term_dt_or_tenor=ten,
                    domestic_notional=dn, foreign_notional=dn / fx,
                    domestic_leg_type=SwapTypes.PAY if j % 2 else
                    SwapTypes.RECEIVE,
                    domestic_coupon=float(rng.uniform(0.02, 0.05)),
                    foreign_spread=float(rng.uniform(-0.002, 0.0)),
                    domestic_freq_type=FrequencyTypes.SEMI_ANNUAL,
                    foreign_freq_type=FrequencyTypes.QUARTERLY,
                    domestic_dc_type=DayCountTypes.ACT_360,
                    foreign_dc_type=DayCountTypes.ACT_365F,
                    domestic_floating_index=dom,
                    foreign_floating_index=forn,
                    domestic_currency=dom_ccy,
                    foreign_currency=for_ccy))
                collateral_types.append(None)
        for ten in ["5Y", "10Y", "30Y"]:
            for s in range(2):  # 12 fix-fix
                dn = float(rng.uniform(5e6, 3e7))
                trades.append(XccyFixFix(
                    effective_dt=xccy_starts[s + 1],
                    term_dt_or_tenor=ten,
                    domestic_notional=dn, foreign_notional=dn / fx,
                    domestic_leg_type=SwapTypes.RECEIVE,
                    domestic_coupon=float(rng.uniform(0.02, 0.05)),
                    foreign_coupon=float(rng.uniform(0.02, 0.05)),
                    domestic_freq_type=FrequencyTypes.ANNUAL,
                    foreign_freq_type=FrequencyTypes.ANNUAL,
                    domestic_dc_type=DayCountTypes.ACT_360,
                    foreign_dc_type=DayCountTypes.ACT_365F,
                    domestic_floating_index=dom,
                    foreign_floating_index=forn,
                    domestic_currency=dom_ccy,
                    foreign_currency=for_ccy))
                collateral_types.append(None)

    # OIS under FOREIGN collateral: GBP and EUR swaps discounted on
    # their {CCY}_USD_XCCY curves in-graph (VERDICT r3 item 2; reference
    # engine.py:217-503)
    for idx, ccy, dc in [
            (CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
             DayCountTypes.ACT_365F),
            (CurveTypes.EUR_OIS_ESTR, CurrencyTypes.EUR,
             DayCountTypes.ACT_360)]:
        for j, ten in enumerate(["2Y", "3Y", "5Y", "7Y", "10Y", "12Y",
                                 "15Y", "20Y", "25Y", "30Y"]):
            trades.append(OIS(  # 20 collateralized
                starts[(j * 5) % len(starts)], ten,
                SwapTypes.PAY if j % 2 else SwapTypes.RECEIVE,
                float(rng.uniform(0.01, 0.06)),
                FrequencyTypes.ANNUAL, dc, idx, ccy,
                notional=float(rng.uniform(1e6, 2e7)), float_dc_type=dc,
                bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING))
            collateral_types.append(CollateralType.USD)

    return trades, collateral_types


def _tree_files(root):
    return sum(len(fs) for _, _, fs in os.walk(root)) \
        if os.path.isdir(root) else 0


def cached_cold_child():
    """Fresh-process shipped-artifact measurement (VERDICT r4 missing
    #1): import the exported persistent-cache archive into an EMPTY
    cache root, rebuild the flagship book from scratch, and time the
    staged warmup with every region compile a CACHE HIT — what a
    production host pays on day one with the deployment archive.

    Why not the serialized-executables archive here: it was measured
    (BENCH_r05, flagship size) at 592 MB with exec load 56 s + first
    call 1,151 s — lazy device program loads through this tunneled dev
    backend run ~0.5 MB/s, strictly worse than the 73 s cold compile.
    The mechanism (fn.save_executables / load_executables, 0.09 s for a
    5.5 MB program incl. device load) stays the production path for
    PCIe-local hosts and is covered by test_staged_risk; cache hits are
    the best measurable day-one story in THIS environment. Prints ONE
    JSON line of phases."""
    import time as _time

    import jax  # noqa: F401 — backend init included in child timings

    import adrates_tpu

    tar = os.environ["ADRATES_CACHED_COLD_TAR"]
    root = os.environ["ADRATES_CACHED_COLD_ROOT"]
    cache_dir = adrates_tpu.import_cache(tar, cache_root=root)
    out = {"cache_entries_after_import": _tree_files(cache_dir)}

    import jax.numpy as jnp  # noqa: F401

    from adrates_tpu.parallel import compile_multibook, tile_multibook, \
        warmup_multibook
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    t0 = _time.perf_counter()
    model = build_model()
    out["model_build_ms"] = round((_time.perf_counter() - t0) * 1e3, 1)
    t0 = _time.perf_counter()
    trades, coll = build_base_trades(model, rng)
    mb_base = compile_multibook(trades, model,
                                base_currency=CurrencyTypes.USD,
                                n_buckets=4, collateral_types=coll,
                                stage_buckets="coarse")
    n_copies = -(-100_000 // len(trades))
    mb = tile_multibook(mb_base, n_copies,
                        notional_scale=rng.uniform(0.5, 2.0, n_copies))
    out["trade_compile_ms"] = round((_time.perf_counter() - t0) * 1e3, 1)
    t0 = _time.perf_counter()
    fn = warmup_multibook(mb, 100, want_gamma=True, staged=True,
                          parallel=True)
    out["warmup_cached_cold_ms"] = round(
        (_time.perf_counter() - t0) * 1e3, 1)
    secs = getattr(fn, "compile_seconds", None)
    if secs:
        out["staged_region_compile_s"] = secs
    print(json.dumps(out), flush=True)


def main():
    import tempfile

    import jax

    import adrates_tpu

    # The package-level persistent-cache story (VERDICT r2 item 8) —
    # but COLD numbers must be measured against a provably empty cache
    # (round-4 ADVICE: a contaminated cache dir made three different
    # runs report three different "fully cold" numbers). Default to a
    # fresh temp dir; ADRATES_CACHE_DIR overrides for manual reruns.
    cold_root = os.environ.get("ADRATES_CACHE_DIR")
    if cold_root is None:
        cold_root = tempfile.mkdtemp(prefix="adrates_cold_cache_")
    cache_dir = adrates_tpu.configure_cache(cold_root)
    n_pre = _tree_files(cache_dir)
    log(f"persistent compile cache: {cache_dir} "
        f"({n_pre} entries at start — cold numbers are genuine iff 0)")

    import jax.numpy as jnp

    from adrates_tpu.utils import (CurrencyTypes, CurveTypes,
                                   DayCountTypes, FrequencyTypes,
                                   RequestTypes, SwapTypes,
                                   BusDayAdjustTypes)
    from adrates_tpu.parallel import (compile_multibook,
                                      make_multibook_fn,
                                      make_per_trade_delta_fn,
                                      tile_multibook, warmup_multibook)
    from adrates_tpu.trades.rates import OIS

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    phases = {}

    # --- config 1: build 12 curves (7 OIS + 3 XCCY + 2 inflation) -------
    t0 = time.perf_counter()
    model = build_model()
    phases["curve_build_cold_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 1)
    log(f"build 12 curves / 7 currencies (cold, incl. compile+refit): "
        f"{phases['curve_build_cold_ms']:.0f} ms")

    curve = model.curves.GBP_OIS_SONIA
    from adrates_tpu.ops.bootstrap import bootstrap_ois
    reboot = jax.jit(bootstrap_ois)
    plan_dev = jax.device_put(curve._plan)
    r_jnp = jnp.asarray(curve.swap_rates)
    float(jnp.sum(reboot(r_jnp, plan_dev)[1]))
    t0 = time.perf_counter()
    for _ in range(100):
        out = reboot(r_jnp, plan_dev)
    # scalar fetch: block_until_ready can return early through the
    # tunneled backend; a reduced value reaching the host is ground truth
    float(jnp.sum(out[1]))
    phases["bootstrap_warm_ms"] = round(
        (time.perf_counter() - t0) / 100 * 1e3, 3)
    log(f"bootstrap 32-pillar (warm, jitted): "
        f"{phases['bootstrap_warm_ms']:.3f} ms (reference ~50 ms)")

    # --- config 2: single 10Y swap PV+delta+gamma (warm latency) --------
    swap = OIS(model.value_dt, "10Y", SwapTypes.RECEIVE, 0.0387,
               FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
               CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
               notional=10_000_000, float_dc_type=DayCountTypes.ACT_365F,
               bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING)
    pos = swap.position(model)
    reqs = [RequestTypes.VALUE, RequestTypes.DELTA, RequestTypes.GAMMA]
    pos.compute(reqs)  # compile
    t0 = time.perf_counter()
    n_rep = 20
    for _ in range(n_rep):
        pos.compute(reqs)
    phases["single_swap_warm_ms"] = round(
        (time.perf_counter() - t0) / n_rep * 1e3, 2)
    log(f"10Y swap PV+delta+gamma (warm): "
        f"{phases['single_swap_warm_ms']:.2f} ms "
        f"(reference ~40 ms delta+gamma)")

    # --- config 3: 100k mixed multi-currency book x 100 scenarios -------
    t0 = time.perf_counter()
    base_trades, coll_types = build_base_trades(model, rng)
    n_coll = sum(c is not None for c in coll_types)
    # coarse stage buckets: the 32-pillar majors and 12-pillar minors
    # merge into ONE vmapped OIS stage — measured (round 5) this cuts
    # the A/C2 region op counts ~25%/35% at the price of padded tangent
    # directions for the minors (see curve_batching.build_batched_grids)
    mb_base = compile_multibook(base_trades, model,
                                base_currency=CurrencyTypes.USD,
                                n_buckets=4,
                                collateral_types=coll_types,
                                stage_buckets="coarse")
    n_base = len(base_trades)
    n_copies = -(-100_000 // n_base)
    mb = tile_multibook(mb_base, n_copies,
                        notional_scale=rng.uniform(0.5, 2.0, n_copies))
    n_total = mb.n_trades
    N = mb.basket.n_quotes
    phases["trade_compile_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    log(f"compile {n_base} base trades (incl. {n_coll} collateralized) "
        f"-> tile to {n_total} "
        f"({phases['trade_compile_ms']:.0f} ms, "
        f"unique times {mb.unique_times.shape[0]}, quotes {N}, "
        f"bucket pads {[b.fix_idx.shape[1] for b in mb.buckets]}, "
        f"clamp slots "
        f"{0 if mb.clamp is None else mb.clamp.w.shape[0]})")

    n_scen = 100
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (n_scen, N)))
    q0 = jnp.asarray(mb.basket.quotes0)

    def fetch(out):
        """Force completion with a host-side scalar round trip
        (block_until_ready can return early through the tunneled
        backend)."""
        return float(sum(jnp.sum(v) for v in out.values()))

    def run_config(want_gamma, n_scen_try, staged):
        sh = shocks[:n_scen_try]
        t0 = time.perf_counter()
        # staged=True: the region programs AOT-compile CONCURRENTLY
        # (the remote compile service parallelizes across client
        # threads) and the kept executables are the dispatch path —
        # the cold-start lever (docs/tpu_operational_notes.md r4).
        fn = warmup_multibook(mb, n_scen_try, want_gamma=want_gamma,
                              staged=staged, parallel=True)
        key = ("warmup_staged_parallel_ms" if staged
               else "warmup_compile_first_run_ms")
        phases[key] = round((time.perf_counter() - t0) * 1e3, 1)
        log(f"warmup_multibook (compile+first run, staged={staged}, "
            f"gamma={want_gamma}, S={n_scen_try}): "
            f"{phases[key]:.0f} ms")
        secs = getattr(fn, "compile_seconds", None)
        if secs:
            phases["staged_region_compile_s"] = secs
            log(f"staged region compiles (concurrent): {secs}")
        t0 = time.perf_counter()
        fetch(fn(q0, sh))
        return time.perf_counter() - t0

    # The remote worker can crash under large compiles (worker-side
    # memory pressure); degrade rather than die without a metric.
    label = f"PV + {N}-pt delta + {N}x{N} gamma"
    book_s = None
    for want_gamma, n_try, staged in [(True, n_scen, True),
                                      (True, n_scen, False),
                                      (False, n_scen, False)]:
        try:
            book_s = run_config(want_gamma, n_try, staged)
            n_scen_used = n_try
            if not want_gamma:
                label = f"PV + {N}-pt delta (gamma skipped: worker limit)"
            break
        except Exception as e:  # noqa: BLE001 — device-level failure
            log(f"book config (gamma={want_gamma}, S={n_try}, "
                f"staged={staged}) failed: {type(e).__name__}: {e}")
            time.sleep(30)

    if book_s is None:
        raise SystemExit("all book configs failed on this device")

    trades_per_sec = n_total * n_scen_used / book_s
    phases["book_warm_ms"] = round(book_s * 1e3, 1)
    log(f"100k mixed multi-ccy book x {n_scen_used} scenarios ({label}): "
        f"{book_s * 1e3:.0f} ms -> {trades_per_sec:,.0f} "
        f"trade-scenarios/sec")

    # --- config 4: per-trade delta ladders (single scenario) ------------
    try:
        per_trade = make_per_trade_delta_fn(mb, chunk=4096)
        float(jnp.sum(per_trade(q0)))
        t0 = time.perf_counter()
        float(jnp.sum(per_trade(q0)))
        phases["per_trade_ladders_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        log(f"per-trade delta ladders [{n_total} x {N}]: "
            f"{phases['per_trade_ladders_ms']:.0f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"per-trade ladder config failed: {type(e).__name__}: {e}")

    # --- per-trade gamma matrices (selected trades, single scenario) ----
    try:
        from adrates_tpu.parallel import make_per_trade_gamma_fn
        sel = rng.choice(n_total, 256, replace=False)
        pt_gamma = make_per_trade_gamma_fn(mb, sel)
        float(jnp.sum(pt_gamma(q0)))
        t0 = time.perf_counter()
        float(jnp.sum(pt_gamma(q0)))
        phases["per_trade_gamma_256_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        log(f"per-trade gamma matrices [256 x {N} x {N}]: "
            f"{phases['per_trade_gamma_256_ms']:.0f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"per-trade gamma config failed: {type(e).__name__}: {e}")

    # --- per-trade gamma BLOCKS, whole book (VERDICT r3 item 3) ---------
    try:
        from adrates_tpu.parallel import make_per_trade_gamma_blocks_fn
        t0 = time.perf_counter()
        blocks_fn = make_per_trade_gamma_blocks_fn(mb)
        # builder HOST cost (python slot-harvest loops) at this book
        # diversity — VERDICT r4 missing #4 asked for it measured
        phases["per_trade_gamma_blocks_build_host_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        log(f"gamma-blocks builder host time: "
            f"{phases['per_trade_gamma_blocks_build_host_ms']:.0f} ms")
        groups = blocks_fn(q0)
        float(sum(jnp.sum(g.blocks) for g in groups))  # compile + run
        t0 = time.perf_counter()
        groups = blocks_fn(q0)
        float(sum(jnp.sum(g.blocks) for g in groups))
        phases["per_trade_gamma_blocks_full_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        n_blk = sum(int(g.trade_ids.shape[0]) for g in groups)
        k_max = max(int(g.qidx.shape[0]) for g in groups)
        log(f"per-trade gamma blocks, FULL book [{n_blk} trades, "
            f"k<= {k_max}]: {phases['per_trade_gamma_blocks_full_ms']:.0f}"
            f" ms across {len(groups)} signature groups")
    except Exception as e:  # noqa: BLE001
        log(f"per-trade gamma blocks config failed: "
            f"{type(e).__name__}: {e}")

    # --- shipped-archive cold start (VERDICT r4 missing #1) -------------
    # export the persistent cache, then a FRESH python process imports
    # it into an EMPTY root, rebuilds the flagship book, and times the
    # staged warmup with every region compile a cache hit: the day-one
    # production story measured, not claimed. (The serialized-
    # executables alternative is tunnel-hostile at flagship size —
    # see cached_cold_child's docstring for the measured verdict.)
    try:
        import subprocess
        import tempfile

        tar = os.path.join(tempfile.gettempdir(),
                           "adrates_cache_ship.tar.gz")
        adrates_tpu.export_cache(tar, cache_root=cold_root)
        child_env = dict(
            os.environ,
            ADRATES_CACHED_COLD_TAR=tar,
            ADRATES_CACHED_COLD_ROOT=tempfile.mkdtemp(
                prefix="adrates_ship_cache_"))
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cached-cold-child"],
            capture_output=True, text=True, env=child_env,
            timeout=900, cwd=os.path.dirname(os.path.abspath(__file__)))
        child_wall = round((time.perf_counter() - t0) * 1e3, 1)
        if proc.returncode == 0 and proc.stdout.strip():
            child = json.loads(proc.stdout.strip().splitlines()[-1])
            child["process_wall_ms"] = child_wall
            phases["cached_cold"] = child
            log(f"shipped-cache fresh process: staged warmup "
                f"{child['warmup_cached_cold_ms']:.0f} ms (model "
                f"{child['model_build_ms']:.0f} ms, trades "
                f"{child['trade_compile_ms']:.0f} ms, whole process "
                f"{child_wall:.0f} ms, archive "
                f"{os.path.getsize(tar)/1e6:.0f} MB)")
        else:
            log(f"cached-cold child failed rc={proc.returncode}: "
                f"{proc.stderr[-500:]}")
    except Exception as e:  # noqa: BLE001
        log(f"shipped-cache phase failed: {type(e).__name__}: {e}")

    # per-phase artifact (VERDICT r2 item 9): attribute round-over-round
    # regressions without re-deriving the split from stderr
    phases["n_trades"] = n_total
    phases["n_base_topologies"] = n_base
    phases["n_scenarios"] = n_scen_used
    phases["n_quotes"] = N
    phases["cache_entries_at_start"] = n_pre
    # frozen config ids (VERDICT r3 item 7): one per BASELINE.md row,
    # bumped ONLY when the measured workload changes shape. flagship_v5 =
    # flagship_v4 (184 quotes, 12 curves, every product family) with the
    # base book grown 218 -> ~1,004 DISTINCT topologies (start dates
    # across 4 years, amortizing bonds, coarse stage buckets) — VERDICT
    # r4 missing #4.
    phases["configs"] = {
        "curve_build_cold_ms": "curves12_v1",
        "bootstrap_warm_ms": "bootstrap32_v1",
        "single_swap_warm_ms": "quickstart10y_v1",
        "book_warm_ms": "flagship_v5",
        "per_trade_ladders_ms": "flagship_v5",
        "per_trade_gamma_256_ms": "flagship_v5",
        "per_trade_gamma_blocks_full_ms": "flagship_v5",
    }
    with open("bench_phases.json", "w") as f:
        json.dump(phases, f, indent=1)
    log(f"phases: {json.dumps(phases)}")

    baseline_trades_per_sec = 25.0
    result = {
        "metric": "book_pv_delta_gamma_trades_per_sec",
        "value": round(trades_per_sec, 1),
        "unit": f"trade-scenarios/sec (100k mixed multi-ccy+inflation "
                f"book, {n_base} distinct base topologies tiled x"
                f"{n_copies}, incl. collateralized, x {n_scen_used} "
                f"scenarios, {label})",
        "config": "flagship_v5",
        "vs_baseline": round(trades_per_sec / baseline_trades_per_sec, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--cached-cold-child" in sys.argv:
        cached_cold_child()
    else:
        main()
