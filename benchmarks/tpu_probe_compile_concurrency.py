"""Measure the remote compile service's effective thread concurrency at
round-5 program sizes: compile N distinct mid-size f64 programs (the
flagship's per-stage lin-of-grad graphs with distinct static shapes so
nothing cache-hits) sequentially vs on N client threads.

Round-4 datum: 3 programs 71.9 s sequential -> 29.1 s threaded (2.47x).
The fine-grained staged split (round 5) ships ~15 programs of 500-2000
ops; whether the wall is max(program) or sum/2.5 depends on how the
service scales past 3 threads.

Usage: python benchmarks/tpu_probe_compile_concurrency.py [n_programs]
NO persistent cache is configured, so every compile is real.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    n_prog = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)

    # Mid-size f64 AD-tower programs shaped like the per-stage hessian
    # pieces: a K-sweep triangular solve + interp + lin-of-grad over a
    # seed basis. Distinct (P, Q) per program -> distinct cache keys.
    def make_prog(P, Q, G):
        def fwd(r, times, accs):
            denom = 1.0 + r_at(r, times) * accs

            def A(x):
                return jnp.concatenate(
                    [jnp.zeros((x.shape[0], 1), x.dtype),
                     x[:, :-1]], axis=1) / denom

            b = accs / denom
            x = b
            for _ in range(12):
                x = b + A(x)
            dfs = (1.0 - r_at(r, times) * x) / denom
            q = jnp.linspace(0.01, 29.0, 400)
            out = jax.vmap(
                lambda t, d: jnp.exp(
                    -jnp.interp(q, t, -jnp.log(d))))(times, dfs)
            return out

        def r_at(r, times):
            sw = jnp.linspace(0.5, 30.0, Q)
            safe = jnp.maximum(r, 1e-8)
            li = jax.vmap(lambda rr: jnp.exp(
                jnp.interp(jnp.linspace(0.5, 30.0, P), sw,
                           jnp.log(safe[0]))))(r)
            return li

        def hess(r, times, accs):
            gfun = jax.grad(
                lambda rr: jnp.sum(fwd(rr, times, accs)))
            _, jvp2 = jax.linearize(gfun, r)
            seeds = jnp.broadcast_to(
                jnp.eye(Q, dtype=r.dtype)[:, None, :], (Q, G, Q))
            return jax.vmap(jvp2)(seeds)

        def prog(r, times, accs, shocks):
            return jax.vmap(lambda s: hess(r + s, times, accs))(shocks)

        r = jnp.full((G, Q), 0.04)
        times = jnp.broadcast_to(jnp.linspace(0.1, 30.0, P), (G, P))
        accs = jnp.full((G, P), 0.25)
        shocks = jnp.zeros((100, G, Q))
        return jax.jit(prog), (r, times, accs, shocks)

    progs = []
    for i in range(n_prog):
        P = 190 + 7 * i          # distinct shapes -> distinct programs
        Q = 24 + i
        progs.append(make_prog(P, Q, 3))

    lowered = []
    t0 = time.perf_counter()
    for f, args in progs:
        lowered.append(f.lower(*args))
    print(f"traced+lowered {n_prog} programs in "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    import re
    for i, low in enumerate(lowered):
        n = len(re.findall(r"= \w+\.\w+", low.as_text()))
        print(f"  program {i}: {n} stablehlo ops", flush=True)

    half = n_prog // 2
    t0 = time.perf_counter()
    for low in lowered[:half]:
        low.compile()
    seq_s = time.perf_counter() - t0
    print(f"sequential compile x{half}: {seq_s:.1f} s "
          f"({seq_s/half:.1f} s/program)", flush=True)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_prog - half) as ex:
        futs = [ex.submit(low.compile) for low in lowered[half:]]
        for f in futs:
            f.result()
    par_s = time.perf_counter() - t0
    print(f"threaded compile x{n_prog - half}: {par_s:.1f} s", flush=True)
    per = seq_s / half
    print(f"effective concurrency at {n_prog - half} threads: "
          f"{per * (n_prog - half) / par_s:.2f}", flush=True)


if __name__ == "__main__":
    main()
