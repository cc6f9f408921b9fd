"""Pallas fused interpolation kernel: parity with the XLA path.

Runs in interpreter mode on CPU; with ADRATES_TEST_TPU=1 it compiles to a
real Mosaic kernel on the chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adrates_tpu.ops.pallas_interp import flat_fwd_df_pallas, \
    flat_fwd_df_xla

INTERPRET = not bool(os.environ.get("ADRATES_TEST_TPU"))


@pytest.fixture(scope="module")
def curve():
    times = jnp.array(np.linspace(0, 30, 33))
    zr = 0.04 + 0.002 * np.sin(np.arange(33))
    dfs = jnp.exp(-jnp.array(zr) * times)
    return times, dfs.at[0].set(1.0)


class TestPallasFlatFwd:
    def test_matches_xla(self, curve):
        times, dfs = curve
        q = jnp.array(np.random.default_rng(0).uniform(0.01, 29.9, 4096))
        a = flat_fwd_df_pallas(q, times, dfs, interpret=INTERPRET)
        b = flat_fwd_df_xla(q, times, dfs)
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)

    def test_non_block_multiple(self, curve):
        times, dfs = curve
        q = jnp.array(np.linspace(0.5, 20.0, 777))
        a = flat_fwd_df_pallas(q, times, dfs, interpret=INTERPRET)
        assert a.shape == (777,)
        b = flat_fwd_df_xla(q, times, dfs)
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)

    def test_extrapolation_clamps(self, curve):
        times, dfs = curve
        q = jnp.array([35.0, 40.0])
        a = flat_fwd_df_pallas(q, times, dfs, interpret=INTERPRET)
        # beyond the last knot the rt clamps -> DF constant
        assert float(a[0]) == pytest.approx(float(dfs[-1]), rel=1e-4)
        assert float(a[1]) == pytest.approx(float(a[0]), abs=1e-7)

    def test_knots_exact(self, curve):
        """Knots reproduce to the f32 speed-path contract (~1e-5
        relative: log/exp roundtrip on the TPU VPU)."""
        times, dfs = curve
        a = flat_fwd_df_pallas(times[1:], times, dfs, interpret=INTERPRET)
        np.testing.assert_allclose(np.array(a), np.array(dfs[1:]),
                                   rtol=1e-4)
