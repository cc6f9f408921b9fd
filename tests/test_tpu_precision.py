"""TPU float64 precision gates (run with ADRATES_TEST_TPU=1 on a chip).

Codifies docs/tpu_f64_notes.md: the kernels must hold 1e-10-level accuracy
on real TPU hardware, where rank-0 fused f64 chains silently run at f32.
On CPU these tests simply re-verify the same invariants.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, CurrencyTypes, CurveTypes,
                               Date, DayCountTypes, FrequencyTypes,
                               InterpTypes, SwapTypes)
from adrates_tpu.ops.bootstrap import bootstrap_ois, prepare_ois_plan
from adrates_tpu.trades.rates import OIS, OISCurve

pytestmark = pytest.mark.tpu

VALUE_DT = Date(1, 1, 2024)


def test_vector_shape_rule():
    """Elementwise f64 chains on >=2-element shapes stay f64-exact."""
    r = jnp.full(4, 0.0451)
    p = jnp.full(4, 0.48640628073446307)
    out = jax.jit(lambda r, p: (1.0 - r * p) / (1.0 + r))(r, p)
    true = (1.0 - 0.0451 * 0.48640628073446307) / 1.0451
    assert abs(float(out[0]) - true) < 1e-14


def test_bootstrap_refit_on_device():
    """The wavefront bootstrap must hold the 1e-10 refit gate on whatever
    backend is active (the scalar-scan formulation fails at ~3e-8 on TPU)."""
    tenors = ["1M", "6M", "1Y", "18M", "2Y", "5Y", "10Y", "30Y"]
    rates = [5.19, 5.04, 4.71, 4.51, 4.35, 3.93, 3.87, 3.71]
    swaps = [OIS(VALUE_DT, ten, SwapTypes.PAY, px / 100,
                 FrequencyTypes.ANNUAL, DayCountTypes.ACT_365F,
                 CurveTypes.GBP_OIS_SONIA, CurrencyTypes.GBP,
                 bd_type=BusDayAdjustTypes.MODIFIED_FOLLOWING,
                 float_dc_type=DayCountTypes.ACT_365F)
             for ten, px in zip(tenors, rates)]
    curve = OISCurve(VALUE_DT, swaps, InterpTypes.LINEAR_ZERO_RATES,
                     check_refit=True)
    worst = max(abs(s.value(VALUE_DT, curve, None)) / s._notional
                for s in swaps)
    assert worst < 1e-10


def test_jitted_bootstrap_identity():
    """df and pv01 recurrences agree with the host-side float64 math."""
    a1 = 0.4986301369863014
    plan = prepare_ois_plan([0.5, 1.5], [[a1], [a1, 1.0]])
    rates = jnp.array([0.0504, 0.0451])
    _, dfs = jax.jit(lambda r: bootstrap_ois(r, plan))(rates)
    d1 = 1.0 / (1.0 + 0.0504 * a1)
    p1 = a1 * d1
    d2 = (1.0 - 0.0451 * p1) / 1.0451
    assert abs(float(dfs[1]) - d1) < 1e-14
    assert abs(float(dfs[2]) - d2) < 1e-14


def test_single_element_interp_padding():
    """(1,)-shaped interpolation queries must not lose f64 precision."""
    from adrates_tpu.ops.interpolation import interp_df
    times = jnp.array([0.0, 1.0, 2.0])
    dfs = jnp.array([1.0, 0.9512294245007141, 0.9048374180359595])
    one = jax.jit(lambda t: interp_df(
        t, times, dfs, InterpTypes.FLAT_FWD_RATES))(jnp.array([1.5]))
    expected = np.exp(-(0.05 * 1.5))  # flat 5% forwards
    assert abs(float(one[0]) - expected) < 1e-12
