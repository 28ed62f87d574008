"""Pallas channelizer kernel vs golden decimator (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vdlm2dec_tpu.golden.dsp import mix_and_decimate
from vdlm2dec_tpu.io.sdr import RTL_DC_OFFSET
from vdlm2dec_tpu.ops.channelizer import (
    aggregation_matrix,
    lo_tables,
    period_phases,
)
from vdlm2dec_tpu.ops.pallas_channelizer import channelize_u8_pallas


@pytest.mark.parametrize("lo_wrap", [True, False])
def test_pallas_channelizer_matches_golden(lo_wrap):
    rng = np.random.default_rng(0)
    fs, sdrclk, p_in, b = 2_000_000, 500, 2000, 64
    offs = (25_000.0, -75_000.0, 150_000.0, 36_500.0)
    lo, _ = lo_tables(offs, fs, sdrclk, lo_wrap)
    ph = period_phases(offs, fs, sdrclk, lo_wrap, b)
    a = aggregation_matrix(sdrclk)
    raw = rng.integers(0, 256, (b, p_in, 2)).astype(np.uint8)
    y = np.asarray(
        channelize_u8_pallas(
            jnp.asarray(np.ascontiguousarray(raw[:, :, 0])),
            jnp.asarray(np.ascontiguousarray(raw[:, :, 1])),
            jnp.asarray(np.ascontiguousarray(lo.real)),
            jnp.asarray(np.ascontiguousarray(lo.imag)),
            jnp.asarray(np.ascontiguousarray(ph.real)),
            jnp.asarray(np.ascontiguousarray(ph.imag)),
            jnp.asarray(a),
            jnp.asarray([np.float32(RTL_DC_OFFSET)]),
            interpret=True,
        )
    )
    x = (
        raw[:, :, 0].astype(np.float64) - RTL_DC_OFFSET
        + 1j * (raw[:, :, 1].astype(np.float64) - RTL_DC_OFFSET)
    ).reshape(-1)
    for ci, fo in enumerate(offs):
        ref = mix_and_decimate(x, fo, fs, sdrclk, lo_table_wrap=lo_wrap)
        got = (y[ci, :, :, 0] + 1j * y[ci, :, :, 1]).reshape(-1)
        np.testing.assert_allclose(got, ref, atol=5e-4)


@pytest.mark.parametrize("fs,sdrclk", [(5_000_000, 1250), (6_000_000, 1500)])
def test_pallas_channelizer_airspy_rates(fs, sdrclk):
    """Airspy decimation chains through the Pallas kernel (interpret)."""
    rng = np.random.default_rng(1)
    p_in = 4 * sdrclk
    b = 32
    offs = (-1_200_000.0,)
    lo, _ = lo_tables(offs, fs, sdrclk, True)
    ph = period_phases(offs, fs, sdrclk, True, b)
    a = aggregation_matrix(sdrclk)
    raw = rng.integers(0, 256, (b, p_in, 2)).astype(np.uint8)
    y = np.asarray(
        channelize_u8_pallas(
            jnp.asarray(np.ascontiguousarray(raw[:, :, 0])),
            jnp.asarray(np.ascontiguousarray(raw[:, :, 1])),
            jnp.asarray(np.ascontiguousarray(lo.real)),
            jnp.asarray(np.ascontiguousarray(lo.imag)),
            jnp.asarray(np.ascontiguousarray(ph.real)),
            jnp.asarray(np.ascontiguousarray(ph.imag)),
            jnp.asarray(a),
            jnp.asarray([np.float32(RTL_DC_OFFSET)]),
            interpret=True,
        )
    )
    x = (
        raw[:, :, 0].astype(np.float64) - RTL_DC_OFFSET
        + 1j * (raw[:, :, 1].astype(np.float64) - RTL_DC_OFFSET)
    ).reshape(-1)
    ref = mix_and_decimate(x, offs[0], fs, sdrclk)
    got = (y[0, :, :, 0] + 1j * y[0, :, :, 1]).reshape(-1)
    np.testing.assert_allclose(got, ref, atol=5e-4)
