"""Direct unit tests for the r5 ingest/trigger building blocks.

These pin PLATFORM semantics (bitcast byte order, split-phase layout,
prefix-sum exactness) that the frame-parity suites only cover
indirectly — a backend with different bitcast endianness would corrupt
every sample while still producing plausible-looking noise."""
import numpy as np

import jax.numpy as jnp

from vdlm2dec_tpu.ops.channelizer import split_phase_index
from vdlm2dec_tpu.ops.demod import _prefix_count
from vdlm2dec_tpu.pipeline import _raw_to_planes, _raw_to_planes_split


def test_cu8_bitcast_matches_plain_deinterleave():
    rng = np.random.default_rng(0)
    p_in = 2000
    raw = rng.integers(0, 256, 8 * p_in * 2).astype(np.uint8)
    xr, xi = _raw_to_planes(jnp.asarray(raw), "cu8",
                            jnp.float32(127.37), p_in)
    want_r = (raw[0::2].astype(np.float32) - 127.37).reshape(-1, p_in)
    want_i = (raw[1::2].astype(np.float32) - 127.37).reshape(-1, p_in)
    np.testing.assert_array_equal(np.asarray(xr), want_r)
    np.testing.assert_array_equal(np.asarray(xi), want_i)


def test_cs16_bitcast_matches_plain_deinterleave():
    rng = np.random.default_rng(1)
    p_in = 2000
    raw = rng.integers(-32768, 32768, 4 * p_in * 2).astype(np.int16)
    xr, xi = _raw_to_planes(jnp.asarray(raw), "cs16", None, p_in)
    np.testing.assert_array_equal(
        np.asarray(xr), raw[0::2].astype(np.float32).reshape(-1, p_in))
    np.testing.assert_array_equal(
        np.asarray(xi), raw[1::2].astype(np.float32).reshape(-1, p_in))


def test_split_phase_planes_and_index_agree():
    """x_split[:, split_phase_index(n)] == x[:, n] for every n — the
    ingest layout and the consumer's remapped tables must agree."""
    rng = np.random.default_rng(2)
    p_in = 2000
    raw = rng.integers(0, 256, 4 * p_in * 2).astype(np.uint8)
    xr_s, xi_s = _raw_to_planes_split(jnp.asarray(raw),
                                      jnp.float32(127.37), p_in)
    xr, xi = _raw_to_planes(jnp.asarray(raw), "cu8",
                            jnp.float32(127.37), p_in)
    n = np.arange(p_in)
    sp = split_phase_index(n, p_in)
    np.testing.assert_array_equal(np.asarray(xr_s)[:, sp], np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(xi_s)[:, sp], np.asarray(xi))


def test_prefix_count_exact():
    rng = np.random.default_rng(3)
    x = (rng.uniform(size=(3, 5000)) < 0.01).astype(np.int32)
    got = np.asarray(_prefix_count(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, axis=1))
    # non-multiple-of-128 length and an all-ones stream (max counts)
    x2 = np.ones((2, 777), np.int32)
    got2 = np.asarray(_prefix_count(jnp.asarray(x2)))
    np.testing.assert_array_equal(got2, np.cumsum(x2, axis=1))
