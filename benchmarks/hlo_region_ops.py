"""Count StableHLO ops of each STAGED REGION program (A/B/C1/C2/D/P)
and of C1's internal pieces, to attribute the region-C1 cold-compile
wall (152.6 s measured round 4; the remote XLA:TPU service compiles
this class of f64 program at roughly 60 ops/s, so compile seconds track
pre-optimization op count).

Runs on CPU; lowering is backend-independent.

Usage: python benchmarks/hlo_region_ops.py [S]
"""

import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def nops(lowered):
    txt = lowered.as_text()
    return len(re.findall(r"= \w+\.\w+", txt)), len(txt)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.multibook import (_agg_clamp,
                                                make_staged_multibook_fn,
                                                tile_multibook)
    from adrates_tpu.parallel.structured_risk import make_structured_parts
    from adrates_tpu.utils import CurrencyTypes

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    rng = np.random.default_rng(7)
    model = bench.build_model()
    trades, coll = bench.build_base_trades(model, rng)
    t0 = time.perf_counter()
    mb = compile_multibook(trades, model, base_currency=CurrencyTypes.USD,
                           n_buckets=4, collateral_types=coll)
    print(f"compile_multibook: {time.perf_counter()-t0:.1f} s")
    basket = mb.basket
    parts = make_structured_parts(basket)
    P = basket.params
    agg = mb.aggregate
    cl_agg = _agg_clamp(mb.clamp, mb.tile)
    q0 = jnp.asarray(basket.quotes0)
    N = basket.n_quotes
    U = mb.unique_times.shape[0]
    CU = basket.n_curves * U
    print(f"N={N} C={basket.n_curves} U={U} S={S}")

    def report(name, f, *args):
        t0 = time.perf_counter()
        low = jax.jit(f).lower(*args)
        n, sz = nops(low)
        print(f"{name:28s}: {n:7d} ops  {sz/1e6:7.2f} MB text  "
              f"(lower {time.perf_counter()-t0:.1f} s)", flush=True)
        return low

    fwd_delta = parts["fwd_delta"]
    term1 = parts["term1"]
    term2_xccy = parts["term2_xccy"]
    term2_ois = parts["term2_ois"]

    sh = jnp.zeros((S, N))

    def _A(qvec, shocks):
        return jax.vmap(lambda s: fwd_delta(qvec + s, P, agg, cl_agg))(
            shocks)

    lowA = report("A (fwd+J+delta)", _A, q0, sh)
    a_sh = lowA.out_info

    def _B(J, dfs):
        return jax.vmap(lambda j, d: term1(j, d, agg, cl_agg))(J, dfs)

    report("B (term1 quad form)", _B, a_sh["J"], a_sh["dfs"])

    def _C1(qvec, g, carry, shocks):
        return jax.vmap(
            lambda gi, ci, s: term2_xccy(qvec + s, P, gi, ci))(
                g, carry, shocks)

    lowC1 = report("C1 (term2 xccy)", _C1, q0, a_sh["g"], a_sh["carry"],
                   sh)
    _, vof_sh = lowC1.out_info

    def _C2(qvec, g, v_of, shocks):
        return jax.vmap(
            lambda gi, vi, s: term2_ois(qvec + s, P, gi, vi))(
                g, v_of, shocks)

    report("C2 (term2 ois)", _C2, q0, a_sh["g"], vof_sh, sh)

    # ---- C1 single-scenario (vmap removed): op count should be ~same
    def _C1_one(qvec, g, carry, shock):
        return term2_xccy(qvec + shock, P, g, carry)

    g1 = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), a_sh["g"])
    c1 = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype),
        a_sh["carry"])
    report("C1 single-scenario", _C1_one, q0, g1, c1, jnp.zeros(N))

    print()


if __name__ == "__main__":
    main()
