"""Per-stage tangent-pass costs on TPU at S=100: time each batched
stage's primal, J-seed jvp sweep, and hessian (fwd-over-rev) separately
to find where the structured risk pass's milliseconds live.

Usage: timeout 3000 python benchmarks/tpu_probe_stage_costs.py [S]
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
    from adrates_tpu.parallel.curve_batching import (infl_native_ds,
                                                     ois_native_ds,
                                                     stage_rows)

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
    basket = mb.basket
    stages = basket._stages
    N = basket.n_quotes
    params = jax.device_put(basket.params)
    q0 = jnp.asarray(basket.quotes0)
    shocks = jnp.asarray(rng.normal(0.0, 1e-3, (S, N)))
    specs = basket.specs
    its_of = [[specs[i].interp_type for i in st.ids] for st in stages]

    def run(name, f):
        t0 = time.perf_counter()
        out = f(q0, params, shocks)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        out = f(q0, params, shocks)
        float(sum(jnp.sum(v) for v in jax.tree.leaves(out)))
        log(f"{name}: warm {(time.perf_counter()-t0)*1e3:.0f} ms")

    for si, st in enumerate(stages):
        if st.kind == "xccy":
            continue

        def primal(qvec, P, sh, si=si, st=st):
            b = P["bat"][st.key]

            def one(s):
                q_local = (qvec + s)[b["qidx"]]
                ds = (ois_native_ds(q_local, b) if st.kind == "ois"
                      else infl_native_ds(q_local, b))
                return stage_rows(P["unique_times"], b["ts_static"], ds,
                                  its_of[si])
            return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

        def jpass(qvec, P, sh, si=si, st=st):
            b = P["bat"][st.key]

            def one(s):
                q_local = (qvec + s)[b["qidx"]]
                G, Qp = q_local.shape

                def fwd(r):
                    ds = (ois_native_ds(r, b) if st.kind == "ois"
                          else infl_native_ds(r, b))
                    rows = stage_rows(P["unique_times"], b["ts_static"],
                                      ds, its_of[si])
                    return ds, rows
                (ds, rows), jvp = jax.linearize(fwd, q_local)
                seeds = jnp.broadcast_to(
                    jnp.eye(Qp, dtype=qvec.dtype)[:, None, :],
                    (Qp, G, Qp))
                dds, drows = jax.vmap(jvp)(seeds)
                return jnp.sum(drows, axis=(1, 2))
            return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

        def hpass(qvec, P, sh, si=si, st=st):
            b = P["bat"][st.key]

            def one(s):
                q_local = (qvec + s)[b["qidx"]]
                G, Qp = q_local.shape

                def fwd(r):
                    ds = (ois_native_ds(r, b) if st.kind == "ois"
                          else infl_native_ds(r, b))
                    rows = stage_rows(P["unique_times"], b["ts_static"],
                                      ds, its_of[si])
                    return ds, rows

                def psi(r):
                    ds, rows = fwd(r)
                    return jnp.sum(rows) + jnp.sum(ds)
                gfun = jax.grad(psi)
                _, jvp2 = jax.linearize(gfun, q_local)
                seeds = jnp.broadcast_to(
                    jnp.eye(Qp, dtype=qvec.dtype)[:, None, :],
                    (Qp, G, Qp))
                Hs = jax.vmap(jvp2)(seeds)
                return jnp.sum(Hs, axis=(1, 2))
            return lax.map(one, sh, batch_size=min(128, sh.shape[0]))

        G, Qp = np.asarray(basket.params["bat"][st.key]["qidx"]).shape
        tag = f"{st.key} (G={G}, dirs={Qp})"
        run(f"{tag} primal", jax.jit(primal))
        run(f"{tag} J jvp sweep", jax.jit(jpass))
        run(f"{tag} hessian fwd-over-rev", jax.jit(hpass))


if __name__ == "__main__":
    main()
