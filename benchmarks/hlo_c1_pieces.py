"""Decompose region C1 (term2-XCCY) and region A (fwd+J+delta) into
their traced sub-graphs and count StableHLO ops of each, to decide
where the concurrent-compile split should cut (round-5 cold-start
work: C1 5,417 ops ~ 152.6 s, A 4,215 ops ~ 106.5 s on the remote
XLA:TPU service at ~35-60 ops/s).

Usage: python benchmarks/hlo_c1_pieces.py
"""

import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def nops(lowered):
    txt = lowered.as_text()
    return len(re.findall(r"= \w+\.\w+", txt))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adrates_tpu.parallel import compile_multibook
    from adrates_tpu.parallel.curve_batching import (
        infl_native_ds, ois_native_ds, stage_rows, xccy_boot_ds,
        xccy_legs_pv)
    from adrates_tpu.parallel.structured_risk import _build_meta
    from adrates_tpu.utils import CurrencyTypes

    rng = np.random.default_rng(7)
    model = bench.build_model()
    trades, coll = bench.build_base_trades(model, rng)
    mb = compile_multibook(trades, model, base_currency=CurrencyTypes.USD,
                           n_buckets=4, collateral_types=coll)
    basket = mb.basket
    meta = _build_meta(basket)
    stages = meta["stages"]
    P = basket.params
    B = P["bat"]
    ut = jnp.asarray(P["unique_times"])
    q0 = jnp.asarray(basket.quotes0)

    def report(name, f, *args):
        low = jax.jit(f).lower(*args)
        print(f"{name:36s}: {nops(low):6d} ops", flush=True)

    # stage inventory
    for si, st in enumerate(stages):
        qidx = np.asarray(B[st.key]["qidx"])
        print(f"stage {si}: kind={st.kind} key={st.key} G={len(st.ids)} "
              f"Qp={qidx.shape[1]} recal={getattr(st, 'recal', None)}")

    its_of = meta["its_of"]
    # ---- per-kind primals -------------------------------------------
    for si, st in enumerate(stages):
        b = B[st.key]
        if st.kind == "ois":
            q_local = q0[jnp.asarray(b["qidx"])]

            def fwd(r, b=b, si=si):
                ds = ois_native_ds(r, b)
                return ds, stage_rows(ut, b["ts_static"], ds, its_of[si])

            report(f"primal ois stage {si}", fwd, q_local)

            def gradf(r, fwd=fwd):
                return jax.grad(lambda rr: jnp.sum(fwd(rr)[1]))(r)

            report(f"grad   ois stage {si}", gradf, q_local)

            G_, Qp = q_local.shape

            def hess(r, fwd=fwd, G_=G_, Qp=Qp):
                gfun = jax.grad(lambda rr: jnp.sum(fwd(rr)[1]))
                _, jvp2 = jax.linearize(gfun, r)
                seeds = jnp.broadcast_to(
                    jnp.eye(Qp, dtype=r.dtype)[:, None, :], (Qp, G_, Qp))
                return jax.vmap(jvp2)(seeds)

            report(f"lin-of-grad ois stage {si}", hess, q_local)
        elif st.kind == "xccy":
            spreads = q0[jnp.asarray(b["qidx"])]
            G_, S = spreads.shape
            Ld = b["dom_ts"].shape[1]
            Lf = b["for_ts"].shape[1]
            dom_ds = jnp.ones((G_, Ld))
            for_ds = jnp.ones((G_, Lf))

            def legs(dd, b=b, st=st):
                return xccy_legs_pv(dd, b, st)

            report(f"primal xccy legs stage {si}", legs, dom_ds)

            pv0 = jnp.ones((G_, S))

            def boot(sp, pv, fd, b=b, st=st, si=si):
                ds = xccy_boot_ds(sp, pv, fd, b, st)
                return stage_rows(ut, b["ts_static"], ds, its_of[si])

            report(f"primal xccy boot stage {si}", boot, spreads, pv0,
                   for_ds)

            def gboot(sp, pv, fd, boot=boot):
                return jax.grad(
                    lambda a, b_, c: jnp.sum(boot(a, b_, c)),
                    argnums=(0, 1, 2))(sp, pv, fd)

            report(f"grad   xccy boot stage {si}", gboot, spreads, pv0,
                   for_ds)

            Qf = 32
            D2 = 2 * S + Qf
            tf2 = jnp.zeros((D2, G_, Lf))

            def hboot(sp, pv, fd, tf2v, boot=boot, G_=G_, S=S, D2=D2):
                def s_hat(Z):
                    sp2 = sp + Z[:, :S]
                    pv2 = pv + Z[:, S:2 * S]
                    fd2 = fd + jnp.einsum("gd,dgl->gl", Z, tf2v)
                    return jnp.sum(boot(sp2, pv2, fd2))

                gfun = jax.grad(s_hat)
                _, jvp2 = jax.linearize(gfun,
                                        jnp.zeros((G_, D2), sp.dtype))
                seeds = jnp.broadcast_to(
                    jnp.eye(D2, dtype=sp.dtype)[:, None, :], (D2, G_, D2))
                return jax.vmap(jvp2)(seeds)

            report(f"lin-of-grad xccy boot stage {si}", hboot, spreads,
                   pv0, for_ds, tf2)

            Qd = 32

            def hlegs(dd, legs=legs, G_=G_, Qd=Qd, Ld=Ld):
                td = jnp.zeros((Qd, G_, Ld), dd.dtype)
                gpv0 = jnp.ones((G_, S))

                def s_legs(Zd):
                    dd2 = dd + jnp.einsum("gd,dgl->gl", Zd, td)
                    return jnp.vdot(gpv0, legs(dd2))

                gfun = jax.grad(s_legs)
                _, jvp2 = jax.linearize(gfun,
                                        jnp.zeros((G_, Qd), dd.dtype))
                seeds = jnp.broadcast_to(
                    jnp.eye(Qd, dtype=dd.dtype)[:, None, :], (Qd, G_, Qd))
                return jax.vmap(jvp2)(seeds)

            report(f"lin-of-grad xccy legs stage {si}", hlegs, dom_ds)
        else:
            q_local = q0[jnp.asarray(b["qidx"])]

            def fwdi(r, b=b, si=si):
                ds = infl_native_ds(r, b)
                return ds, stage_rows(ut, b["ts_static"], ds, its_of[si])

            report(f"primal infl stage {si}", fwdi, q_local)

            G_, Qp = q_local.shape

            def hessi(r, fwdi=fwdi, G_=G_, Qp=Qp):
                gfun = jax.grad(lambda rr: jnp.sum(fwdi(rr)[1]))
                _, jvp2 = jax.linearize(gfun, r)
                seeds = jnp.broadcast_to(
                    jnp.eye(Qp, dtype=r.dtype)[:, None, :], (Qp, G_, Qp))
                return jax.vmap(jvp2)(seeds)

            report(f"lin-of-grad infl stage {si}", hessi, q_local)


if __name__ == "__main__":
    main()
