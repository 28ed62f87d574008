"""JAX op equivalence vs the golden oracle (on CPU mesh)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vdlm2dec_tpu import constants as C
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.golden import codec
from vdlm2dec_tpu.golden.dsp import GoldenChannel, mix_and_decimate
from vdlm2dec_tpu.ops import assembly, header, rs_fec
from vdlm2dec_tpu.ops.channelizer import Channelizer
from vdlm2dec_tpu.ops.demod import (
    demod_candidates_flat,
    find_triggers,
    pack_complex,
    phase_of,
    polyphase_filter,
    sync_scan,
)


# ---------------------------------------------------------------------------
# channelizer
# ---------------------------------------------------------------------------

def test_channelizer_matches_reference_decimator():
    rng = np.random.default_rng(0)
    fs, sdrclk = 2_000_000, 500
    t = 3 * 4 * sdrclk
    x = (rng.normal(size=t) + 1j * rng.normal(size=t)).astype(np.complex64)
    offsets = [25_000.0, -75_000.0, 150_000.0]
    chan = Channelizer(offsets, fs=fs, sdrclk=sdrclk, lo_wrap=True)
    y = np.asarray(chan(x))
    yc = y[..., 0] + 1j * y[..., 1]
    for ci, fo in enumerate(offsets):
        ref = mix_and_decimate(x, fo, fs, sdrclk, lo_table_wrap=True)
        assert yc.shape[1] == len(ref)
        np.testing.assert_allclose(yc[ci], ref, atol=2e-5)


def test_channelizer_streaming_continuity():
    """Two half-blocks must equal one full block (period phase carry)."""
    rng = np.random.default_rng(1)
    fs, sdrclk = 2_000_000, 500
    p = 4 * sdrclk
    x = (rng.normal(size=4 * p) + 1j * rng.normal(size=4 * p)).astype(np.complex64)
    chan1 = Channelizer([30_000.0], fs=fs, lo_wrap=False)
    full = np.asarray(chan1(x))
    chan2 = Channelizer([30_000.0], fs=fs, lo_wrap=False)
    a = np.asarray(chan2(x[: 2 * p]))
    b = np.asarray(chan2(x[2 * p :]))
    np.testing.assert_allclose(np.concatenate([a, b], axis=1), full, atol=2e-5)


def test_channelizer_airspy_rates():
    rng = np.random.default_rng(2)
    for fs, sdrclk in [(5_000_000, 1250), (6_000_000, 1500)]:
        p = 4 * sdrclk
        x = (rng.normal(size=2 * p)).astype(np.float32)   # real input
        chan = Channelizer([-1_200_000.0], fs=fs, sdrclk=sdrclk, real_input=True)
        y = np.asarray(chan(x))
        yc = y[..., 0] + 1j * y[..., 1]
        ref = mix_and_decimate(x.astype(np.complex64), -1_200_000.0, fs, sdrclk)
        assert yc.shape[1] == len(ref) == 168
        np.testing.assert_allclose(yc[0], ref, atol=2e-5)


# ---------------------------------------------------------------------------
# polyphase filter + sync metric
# ---------------------------------------------------------------------------

def _golden_trace(sig):
    ch = GoldenChannel()
    ch.run(sig)
    return ch


def test_sync_metric_matches_golden():
    rng = np.random.default_rng(3)
    content = rng.integers(0, 256, 30).astype(np.uint8)
    plan = mod.make_burst([content])
    sig = mod.synthesize_baseband(plan, start=400, cfo_hz=80.0)
    sig = mod.awgn(sig, 18.0, rng)
    gch = _golden_trace(sig)

    y = jnp.asarray(pack_complex(sig[None, :]))
    f = polyphase_filter(y)
    p0 = np.asarray(phase_of(f[:, 0]))[0]
    err, fr = sync_scan(jnp.asarray(p0[None, :]))
    err, fr = np.asarray(err)[0], np.asarray(fr)[0]

    # golden records (t, err, fr) for every WSYNC metric position.  Compare
    # only up to the first trigger: after a burst the serial decoder's phase
    # ring is stale (frozen during the burst) while the vectorised scan uses
    # true phases — an intentional divergence handled by overlap filtering.
    first_trigger = gch.bursts[0].start_index if gch.bursts else len(err)
    checked = 0
    for (t, ge, gf) in gch.sync_errs:
        if t < 200 or t >= first_trigger:
            continue
        assert err[t] == pytest.approx(ge, abs=2e-3), f"err mismatch at t={t}"
        assert fr[t] == pytest.approx(gf, abs=1e-4), f"fr mismatch at t={t}"
        checked += 1
    assert checked > 50


def test_triggers_match_golden():
    rng = np.random.default_rng(4)
    content = rng.integers(0, 256, 30).astype(np.uint8)
    plan = mod.make_burst([content])
    sig = mod.synthesize_baseband(plan, start=500, timing_frac=0.4)
    sig = mod.awgn(sig, 15.0, rng)
    gch = _golden_trace(sig)
    assert len(gch.bursts) == 1
    gb = gch.bursts[0]

    y = jnp.asarray(pack_complex(sig[None, :]))
    f = polyphase_filter(y)
    err, fr = sync_scan(phase_of(f[:, 0]))
    t0, of, df, valid, q = find_triggers(err, fr, 4)
    t0 = np.asarray(t0)[0]
    assert valid[0, 0]
    assert t0[0] == gb.start_index
    assert np.asarray(of)[0, 0] == pytest.approx(gb.timing, abs=1e-2)
    assert np.asarray(df)[0, 0] == pytest.approx(gb.freq_offset, abs=1e-5)


def test_find_triggers_block_compaction_parity():
    """The earliest-K selection compacts (C, T) to per-128-block minima
    before the top_k (valid because suppression guarantees survivors are
    >136 samples apart, so a block holds at most one).  Compare against a
    brute-force numpy replay of the trigger/suppression/selection rules,
    with planted triggers straddling 128-block seams, closer than the
    137-sample suppression window, and in the padded tail."""
    from vdlm2dec_tpu.ops import demod as demod_mod

    rng = np.random.default_rng(11)
    c, t = 3, 4000
    err = rng.normal(size=(c, t)).astype(np.float32) + 10.0   # no triggers
    fr = rng.normal(size=(c, t)).astype(np.float32) * 1e-3
    # plant dips that fire the hysteresis trigger at known odd positions:
    # block-seam pairs (255/257, 511/513), a <137-gap pair (1023/1101 ->
    # the second must be suppressed), and tail positions
    spots = [(0, 201), (0, 255), (0, 257), (0, 511), (0, 513),
             (1, 1023), (1, 1101), (1, 2049),
             (2, 3901), (2, 3999)]
    for ci, tp in spots:
        err[ci, tp - 2] = 0.0          # e1 < threshold
        err[ci, tp] = 5.0              # e0 > e1

    k = 4
    t0, of, df, valid, q = demod_mod.find_triggers(
        jnp.asarray(err), jnp.asarray(fr), k)

    # brute-force replay of the documented rules
    e1 = np.pad(err, ((0, 0), (2, 0)))[:, :t]
    trig = np.zeros((c, t), bool)
    for ci in range(c):
        for tp in range(150, t):
            if tp % 2 and e1[ci, tp] < 4.0 and err[ci, tp] > e1[ci, tp]:
                trig[ci, tp] = True
    exp = []
    for ci in range(c):
        fired = np.nonzero(trig[ci])[0]
        kept, last_any = [], -10**9
        for tp in fired:
            if tp - last_any > 136:
                kept.append(tp)
            last_any = tp              # ANY trigger suppresses followers
        # invalid slots come back clamped to t-1 with valid=False
        exp.append((kept[:k] + [t - 1] * k)[:k])
    t0 = np.asarray(t0)
    np.testing.assert_array_equal(t0, np.array(exp))
    n_kept = sum(min(k, len([tp for tp in np.nonzero(trig[ci])[0]
                             if _kept(np.nonzero(trig[ci])[0], tp)]))
                 for ci in range(c))
    assert np.asarray(valid).sum() == n_kept


def _kept(fired, tp):
    prevs = fired[fired < tp]
    return len(prevs) == 0 or tp - prevs.max() > 136


# ---------------------------------------------------------------------------
# full device demod vs golden block
# ---------------------------------------------------------------------------

def test_demod_block_matches_golden():
    rng = np.random.default_rng(5)
    content = rng.integers(0, 256, 60).astype(np.uint8)
    plan = mod.make_burst([content])
    sig = mod.synthesize_baseband(plan, start=400, cfo_hz=120.0, timing_frac=0.6)
    sig = mod.awgn(sig, 14.0, rng)
    gch = _golden_trace(sig)
    assert len(gch.bursts) == 1
    gb = gch.bursts[0]

    max_symbols = 1024
    y = jnp.asarray(pack_complex(sig[None, :]))
    f = polyphase_filter(y)
    err, fr = sync_scan(phase_of(f[:, 0]))
    t0, of, df, valid, q = find_triggers(err, fr, 4)
    chan = jnp.zeros((4,), jnp.int32)
    soft = demod_candidates_flat(
        y, chan, t0[0], of[0], df[0], max_symbols, polyphase_filter(y)
    )
    flat = np.asarray(soft)[0]

    length, nbrow, nlbyte, ok = header.header_decode(jnp.asarray(flat[None, :25]))
    assert bool(ok[0])
    assert int(length[0]) == gb.length_bits
    assert int(nbrow[0]) == gb.nbrow
    assert int(nlbyte[0]) == gb.nlbyte

    data_soft = flat[25 : 25 + 8 * assembly.MAX_TX_BYTES]
    data_soft = np.pad(data_soft, (0, 8 * assembly.MAX_TX_BYTES - len(data_soft)))
    blocks, consumed = assembly.assemble_blocks(
        jnp.asarray(data_soft[None, :]),
        jnp.asarray([int(nbrow[0])]),
        jnp.asarray([int(nlbyte[0])]),
    )
    blk = np.asarray(blocks)[0, : gb.nbrow]
    np.testing.assert_array_equal(blk, gb.block)


# ---------------------------------------------------------------------------
# RS vectorised vs golden
# ---------------------------------------------------------------------------

def _random_codeword(rng):
    data = rng.integers(0, 256, C.RS_K).astype(np.uint8)
    parity = codec.rs_encode_row(data)
    return np.concatenate([data, parity])


def test_rs_rows_match_golden():
    rng = np.random.default_rng(6)
    rows, classes, want_rows, want_counts = [], [], [], []
    for trial in range(24):
        cw = _random_codeword(rng)
        nerr = int(rng.integers(0, 5))
        bad = cw.copy()
        pos = rng.choice(C.RS_N, nerr, replace=False)
        for p in pos:
            bad[p] ^= int(rng.integers(1, 256))
        cls = int(rng.integers(0, 3))
        eras = [[], [253, 254], [251, 252, 253, 254]][cls]
        for e in eras:
            bad[e] = 0
        g_out, g_cnt = codec.rs_decode_row(bad, eras)
        rows.append(bad)
        classes.append(cls)
        want_rows.append(g_out)
        want_counts.append(g_cnt)
    got_rows, got_counts = rs_fec.rs_decode_rows(
        jnp.asarray(np.stack(rows)), jnp.asarray(classes, dtype=jnp.int32)
    )
    got_rows, got_counts = np.asarray(got_rows), np.asarray(got_counts)
    for i in range(len(rows)):
        assert got_counts[i] == want_counts[i], f"count mismatch @{i}"
        np.testing.assert_array_equal(got_rows[i], want_rows[i], err_msg=f"row {i}")


def test_rs_bilinear_and_inverse_exhaustive():
    """The gather-free Forney building blocks are exact over the WHOLE
    field: _gfmul_bilinear against the mul LUT on all 65536 byte pairs,
    and the inv table (inv[0] = 0) against a*inv(a) == 1."""
    a = np.repeat(np.arange(256), 256).astype(np.int32)
    b = np.tile(np.arange(256), 256).astype(np.int32)
    mats = rs_fec._matrices()
    got = np.asarray(rs_fec._gfmul_bilinear(
        jnp.asarray(a), jnp.asarray(b[: len(a)]),
        jnp.asarray(mats["bilin"])))
    want = rs_fec._mul_table()[a * 256 + b]
    np.testing.assert_array_equal(got, want)
    inv = mats["inv"]
    assert inv[0] == 0
    x = np.arange(1, 256)
    prod = rs_fec._mul_table()[x * 256 + inv[x]]
    np.testing.assert_array_equal(prod, np.ones(255, np.int64))
    lut = np.asarray(rs_fec._lut_lookup_onehot(
        jnp.asarray(np.arange(256), dtype=jnp.int32), jnp.asarray(inv)))
    np.testing.assert_array_equal(lut, inv)


def test_rs_rows_uncorrectable_matches_golden():
    rng = np.random.default_rng(7)
    rows, want_counts = [], []
    for trial in range(8):
        cw = _random_codeword(rng)
        bad = cw.copy()
        for p in rng.choice(C.RS_N, 8, replace=False):
            bad[p] ^= int(rng.integers(1, 256))
        _, g_cnt = codec.rs_decode_row(bad, [])
        rows.append(bad)
        want_counts.append(g_cnt)
    _, got_counts = rs_fec.rs_decode_rows(
        jnp.asarray(np.stack(rows)), jnp.zeros(len(rows), dtype=jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(got_counts), want_counts)


# ---------------------------------------------------------------------------
# header decode batched vs golden
# ---------------------------------------------------------------------------

def test_header_decode_batch():
    rng = np.random.default_rng(8)
    softs, want = [], []
    for _ in range(32):
        length = int(rng.integers(96, 8 * 1992))
        bits = codec.header_encode(length)
        soft = np.clip(
            bits.astype(np.float64) * 0.96 + 0.02 + rng.normal(0, 0.05, 25), 0.001, 0.999
        )
        g_len, _ = codec.header_decode_soft(soft)
        softs.append(soft)
        want.append(g_len)
    length, nbrow, nlbyte, ok = header.header_decode(jnp.asarray(np.stack(softs)))
    np.testing.assert_array_equal(np.asarray(length), want)


def test_sync_scan_chunked_matches_dense():
    """The lax.map-chunked sync scan (engaged above the dense element
    limit) matches the dense formulation to float-reassociation level."""
    import jax.numpy as jnp

    from vdlm2dec_tpu.ops import demod

    rng = np.random.default_rng(3)
    p0 = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (3, 20000)).astype(np.float32))
    dense = demod._sync_scan_core(jnp.pad(p0, ((0, 0), (128, 0))), 20000)
    limit = demod._SYNC_DENSE_LIMIT
    try:
        demod._SYNC_DENSE_LIMIT = 1
        chunked = demod.sync_scan(p0)
    finally:
        demod._SYNC_DENSE_LIMIT = limit
    for a, b in zip(dense, chunked):
        # the guard here is chunk-SEAM alignment (an off-by-one window
        # produces O(1) errors); the tolerance allows for XLA fusing the
        # running-sum core differently inside lax.map vs standalone
        # (FMA/reassociation ~3e-5 rel on the closed-form residual)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_dft_qr_matches_gather_formulation():
    """The gather-free (B,Q,tbl) x (Q,tbl,84) residue contraction computes
    the same products as the original residue-space gather (each (r, m)
    cell has exactly one contributing q), in both sample-ordered and
    split-phase layouts."""
    import jax.numpy as jnp

    from vdlm2dec_tpu.ops import channelizer as ch

    fo = tuple(float(-75_000 + 50_000 * i) for i in range(4))
    fs, sdrclk = 2_000_000, 500
    p_in, _ = ch.period_for(sdrclk)
    rng = np.random.default_rng(9)
    b = 6
    xr = rng.normal(size=(b, p_in)).astype(np.float32)
    xi = rng.normal(size=(b, p_in)).astype(np.float32)

    w, idx, mask, invlen = ch.dft_tables(fo, fs, sdrclk)
    ref = ch._channelize_dft_jit(
        jnp.asarray(xr), jnp.asarray(xi),
        jnp.asarray(w.real.copy()), jnp.asarray(w.imag.copy()),
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(invlen))

    wq, a2 = ch.dft_qr_tables(fo, fs, sdrclk, False)
    got = ch._channelize_dft_qr_jit(
        jnp.asarray(xr), jnp.asarray(xi),
        jnp.asarray(wq.real.copy()), jnp.asarray(wq.imag.copy()),
        jnp.asarray(a2))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)

    # split-phase: planes re-ordered [evens | odds], same output
    h = p_in // 2
    xr_s = np.concatenate([xr[:, 0::2], xr[:, 1::2]], axis=1)
    xi_s = np.concatenate([xi[:, 0::2], xi[:, 1::2]], axis=1)
    ws, a2s = ch.dft_qr_tables(fo, fs, sdrclk, True)
    got_s = ch._channelize_dft_qr_jit(
        jnp.asarray(xr_s), jnp.asarray(xi_s),
        jnp.asarray(ws.real.copy()), jnp.asarray(ws.imag.copy()),
        jnp.asarray(a2s), split=True)
    for g, r in zip(got_s, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
