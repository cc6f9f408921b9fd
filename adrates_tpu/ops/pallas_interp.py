"""Pallas TPU kernel: fused flat-forward curve interpolation.

One VMEM pass computes, for a large batch of query times, the interval
search (branchless one-hot contraction against the knot grid), the linear
blend in rt = -log(DF) space, and the exponentiation — the gather+interp+
exp chain the XLA path emits as separate HLOs (SURVEY §7 step 2 / the
north-star's "fused Pallas gather+spline-eval kernels").

Precision contract: the kernel runs in float32 and is the SPEED path for
huge scenario sweeps where ~1e-7 relative error is acceptable (e.g. P&L
grids); calibration and risk stay on the float64 XLA path
(docs/tpu_f64_notes.md — Mosaic has no f64 vector unit).

Falls back to the XLA implementation when Pallas is unavailable (CPU test
runs use interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 1024  # queries per grid step (8 sublanes x 128 lanes)
_MAX_KNOTS = 128


def _ffwd_kernel(times_ref, rt_ref, q_ref, out_ref):
    """out = exp(-interp(q, times, rt)) for one query block.

    The knot grid lives in SMEM (a few dozen scalars) and the interval
    search unrolls over it: an [8,128] VPU compare per knot. All integer
    math is pinned to int32 (Mosaic has no 64-bit types) and there are no
    gathers — bracketing knots accumulate through unrolled selects.
    """
    t = q_ref[:]                                   # [8, 128]
    n = times_ref.shape[0]

    idx = jnp.zeros(t.shape, jnp.int32)
    for k in range(1, n):
        idx = idx + (t >= times_ref[k]).astype(jnp.int32)
    idx = jnp.minimum(idx, jnp.int32(n - 2))      # interval [0, n-2]

    t_lo = jnp.zeros(t.shape, t.dtype)
    t_hi = jnp.zeros(t.shape, t.dtype)
    rt_lo = jnp.zeros(t.shape, t.dtype)
    rt_hi = jnp.zeros(t.shape, t.dtype)
    for k in range(n - 1):
        m = idx == jnp.int32(k)
        t_lo = jnp.where(m, times_ref[k], t_lo)
        t_hi = jnp.where(m, times_ref[k + 1], t_hi)
        rt_lo = jnp.where(m, rt_ref[k], rt_lo)
        rt_hi = jnp.where(m, rt_ref[k + 1], rt_hi)

    # clamp to the ends (constant extrapolation in rt space, like
    # jnp.interp)
    w = (t - t_lo) / (t_hi - t_lo)
    w = jnp.clip(w, 0.0, 1.0)
    rt_q = rt_lo + w * (rt_hi - rt_lo)
    out_ref[:] = jnp.exp(-rt_q)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flat_fwd_df_pallas(queries, times, dfs, interpret: bool = False):
    """DF(queries) under FLAT_FWD interpolation — fused Pallas kernel.

    queries [Q] (any Q; padded to the block size), times/dfs [N<=128].
    float32 in/out. ``interpret=True`` runs the kernel in interpreter mode
    (for CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    queries = queries.astype(jnp.float32)
    times = times.astype(jnp.float32)
    rt = -jnp.log(dfs.astype(jnp.float32))

    q = queries.shape[0]
    # One kernel invocation per chunk (grid + SMEM specs fail to legalize
    # on this Mosaic version); chunks sized well inside VMEM.
    chunk = _BLOCK * 512  # 512k queries = 2 MB f32
    q_pad = ((q + _BLOCK - 1) // _BLOCK) * _BLOCK
    queries_p = jnp.pad(queries, (0, q_pad - q))

    def one_chunk(qc):
        rows = qc.shape[0] // 128
        return pl.pallas_call(
            _ffwd_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, 128), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda: (0, 0)),
            interpret=interpret,
        )(times, rt, qc.reshape(rows, 128)).reshape(-1)

    if q_pad <= chunk:
        out = one_chunk(queries_p)
    else:
        n_chunks = -(-q_pad // chunk)
        queries_p = jnp.pad(queries_p, (0, n_chunks * chunk - q_pad))
        out = jax.lax.map(one_chunk,
                          queries_p.reshape(n_chunks, chunk)).reshape(-1)
    return out[:q]


def flat_fwd_df_xla(queries, times, dfs):
    """Reference XLA implementation (same f32 math) for parity checks."""
    queries = queries.astype(jnp.float32)
    rt = -jnp.log(dfs.astype(jnp.float32))
    return jnp.exp(-jnp.interp(queries, times.astype(jnp.float32), rt))
