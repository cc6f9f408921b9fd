"""XCCY stage component costs on TPU at S=100: legs (pv_dom) vs
bootstrap vs row interp, primal and under tangent sweeps — decides
whether a pv_dom-bottleneck split of the stage is worth building.

Usage: timeout 3000 python benchmarks/tpu_probe_xccy_stage.py [S]
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
    from adrates_tpu.parallel.curve_batching import (ois_native_ds,
                                                     stage_rows)
    from adrates_tpu.ops.pricers import pv_float_leg
    from adrates_tpu.ops.xccy_bootstrap import bootstrap_xccy

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
    mb = tile_multibook(mb_base, -(-100_000 // len(trades)),
                        notional_scale=rng.uniform(
                            0.5, 2.0, -(-100_000 // len(trades))))
    basket = mb.basket
    stages = basket._stages
    N = basket.n_quotes
    params = jax.device_put(basket.params)
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))
    specs = basket.specs
    st = next(s for s in stages if s.kind == "xccy")
    si = stages.index(st)
    its = [specs[i].interp_type for i in st.ids]

    # static parent natives at the base point (frozen for this probe:
    # we only care about xccy-stage costs, not the parent chain)
    B0 = basket.params["bat"]
    b_np = B0[st.key]
    pos_of = {}
    for sj, stj in enumerate(stages):
        for mi, cid in enumerate(stj.ids):
            pos_of[cid] = (sj, mi)

    dom_list, for_list = [], []
    for mi in range(len(st.ids)):
        for kind, ids, L in (("d", st.dom_ids, b_np["dom_ts"].shape[1]),
                             ("f", st.for_ids, b_np["for_ts"].shape[1])):
            sj, mj = pos_of[ids[mi]]
            bj = B0[stages[sj].key]
            ds = ois_native_ds(
                jnp.asarray(basket.quotes0)[jnp.asarray(bj["qidx"])],
                bj)[mj]
            pad = L - ds.shape[0]
            ds = jnp.concatenate([ds, jnp.ones(pad)]) if pad else ds
            (dom_list if kind == "d" else for_list).append(ds)
    dom_ds0 = jnp.stack(dom_list)
    for_ds0 = jnp.stack(for_list)
    G = dom_ds0.shape[0]
    Sx = np.asarray(b_np["qidx"]).shape[1]
    log(f"xccy stage: G={G}, S={Sx}, Ld={dom_ds0.shape[1]}")

    def run(name, f, *args):
        t0 = time.perf_counter()
        out = f(*args)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        out = f(*args)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: warm {(time.perf_counter()-t0)*1e3:.0f} ms")

    def legs_only(qvec, P, dd, sh):
        b = P["bat"][st.key]
        d_it = st.dom_interp

        def one(s):
            def one_curve(dts, dds, lts):
                return jax.vmap(
                    lambda lt: pv_float_leg(dds, dts, d_it, lt))(lts)
            return jax.vmap(one_curve)(b["dom_ts"], dd + 0.0 * s[0],
                                       b["legs"])
        return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

    def boot_only(qvec, P, dd, fd, sh):
        b = P["bat"][st.key]
        d_it = st.dom_interp

        def one(s):
            sp = (qvec + s)[b["qidx"]]

            def one_curve(dts, dds, lts):
                return jax.vmap(
                    lambda lt: pv_float_leg(dds, dts, d_it, lt))(lts)
            pv = jax.vmap(one_curve)(b["dom_ts"], dd, b["legs"])
            _, ds = jax.vmap(bootstrap_xccy,
                             in_axes=(0, 0, 0, 0, 0, 0, None))(
                sp, pv, b["for_ts"], fd, b["spot_fx"], b["plan"],
                st.foreign_interp)
            return ds
        return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

    def full_stage(qvec, P, dd, fd, sh):
        b = P["bat"][st.key]
        from adrates_tpu.parallel.curve_batching import xccy_native_ds

        def one(s):
            sp = (qvec + s)[b["qidx"]]
            ds = xccy_native_ds(sp, dd, fd, b, st)
            return stage_rows(P["unique_times"], b["ts_static"], ds, its)
        return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

    def full_hess(qvec, P, dd, fd, sh):
        b = P["bat"][st.key]
        from adrates_tpu.parallel.curve_batching import xccy_native_ds
        D = Sx + dom_ds0.shape[1] // 2  # representative dir count: 72
        D = 72

        def one(s):
            sp = (qvec + s)[b["qidx"]]

            def s_hat(Z):
                sp2 = sp + Z[:, :Sx]
                dd2 = dd + 1e-7 * jnp.sum(Z, axis=1, keepdims=True)
                fd2 = fd + 1e-7 * jnp.sum(Z, axis=1, keepdims=True)
                ds = xccy_native_ds(sp2, dd2, fd2, b, st)
                rows = stage_rows(P["unique_times"], b["ts_static"], ds,
                                  its)
                return jnp.sum(rows)
            gfun = jax.grad(s_hat)
            _, jvp2 = jax.linearize(gfun, jnp.zeros((G, D)))
            seeds = jnp.broadcast_to(
                jnp.eye(D)[:, None, :], (D, G, D))
            return jax.vmap(jvp2)(seeds)
        return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

    run("legs only (pv_dom, 24 legs)", jax.jit(legs_only), q0, params,
        dom_ds0, shocks)
    run("legs+boot primal", jax.jit(boot_only), q0, params, dom_ds0,
        for_ds0, shocks)
    run("full stage primal (+interp rows)", jax.jit(full_stage), q0,
        params, dom_ds0, for_ds0, shocks)
    run("full stage 72-dir hessian", jax.jit(full_hess), q0, params,
        dom_ds0, for_ds0, shocks)


if __name__ == "__main__":
    main()
