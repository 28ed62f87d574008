"""End-to-end decode pipeline: wideband IQ -> decoded AVLC frames.

Device-resident stages (one jitted program):
  channelizer -> polyphase filter -> vectorised sync scan -> candidate
  trigger extraction -> batched burst demod -> header trellis -> block
  assembly -> vectorised RS FEC
Host stages (tiny, irregular):
  greedy overlap filtering (replicates the serial decoder's
  first-trigger-wins, since the reference suspends sync search during a
  burst) -> HDLC unstuff -> CRC -> AVLC/L5.

Streaming: long captures are processed in overlapping blocks; a candidate is
owned by the block whose core region contains its trigger.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .constants import DEMOD_RATE, MAX_BURST_SYMBOLS, RS_K, SPS
from .golden.codec import Unstuffer, frame_crc_ok
from .ops.assembly import MAX_TX_BYTES, assemble_blocks
from .ops.channelizer import Channelizer
from .ops.demod import (
    demod_candidates,
    find_triggers,
    pack_complex,
    phase_of,
    polyphase_filter,
    sync_scan,
)
from .ops.header import header_decode
from .ops.rs_fec import rs_decode_rows

TWO_PI = 2.0 * math.pi


@dataclass
class DecodedBurst:
    """A CRC-pending decoded burst (post-FEC), plus its valid frames."""
    channel: int
    t0: int                      # decimated-sample index of sync trigger
    time_s: float                # t0 / 84 kHz relative to stream start
    freq_hz: float               # RF channel frequency
    ppm: float                   # per-burst frequency-offset estimate
    length_bits: int
    nbrow: int
    nlbyte: int
    block: np.ndarray            # (nbrow, 255) RS-corrected
    rs_counts: list[int]
    frames: list[np.ndarray] = field(default_factory=list)  # incl. flags


@dataclass
class PipelineConfig:
    freqs_hz: list[float]                  # RF channel frequencies
    fs: int = 2_000_000                    # wideband input rate
    fc_hz: float | None = None             # center frequency (None: auto)
    real_input: bool = False               # airspy-style real capture
    lo_wrap: bool = True                   # reference's wrapped LO table
    max_candidates: int = 16               # sync candidates per channel/block
    max_symbols: int = MAX_BURST_SYMBOLS   # burst demod window
    sdrclk: int | None = None
    mesh: object | None = None             # jax.sharding.Mesh for multi-chip

    def resolved_sdrclk(self) -> int:
        return self.sdrclk if self.sdrclk is not None else self.fs // 4000


def _device_decode(y, max_candidates: int, max_symbols: int):
    """All device stages on a (C, T, 2) decimated block (re/im planes)."""
    f = polyphase_filter(y)
    p0 = phase_of(f[:, 0])
    err, fr = sync_scan(p0)
    t0, of, df, valid = find_triggers(err, fr, max_candidates)
    soft = demod_candidates(y, t0, of, df, max_symbols, f_all=f)
    c, k, nb = soft.shape
    flat = soft.reshape(c * k, nb)
    length, nbrow, nlbyte, ok = header_decode(flat[:, :25])
    need = 8 * MAX_TX_BYTES
    data_soft = flat[:, 25 : 25 + need]
    if data_soft.shape[1] < need:
        data_soft = jnp.pad(data_soft, ((0, 0), (0, need - data_soft.shape[1])))
    blocks, consumed = assemble_blocks(data_soft, nbrow, nlbyte)

    # per-row erasure class: last row -> by nlbyte thresholds (vdlm2.c:64-82)
    rows = blocks.reshape(c * k * 8, 255)
    ridx = jnp.tile(jnp.arange(8), c * k).reshape(c * k, 8)
    is_last = ridx == (nbrow[:, None] - 1)
    cls_last = jnp.where(
        nlbyte[:, None] <= 30, 2, jnp.where(nlbyte[:, None] <= 67, 1, 0)
    )
    eras_class = jnp.where(is_last, cls_last, 0).reshape(-1)
    fixed, counts = rs_decode_rows(rows, eras_class)

    return dict(
        t0=t0, of=of, df=df, valid=valid,
        length=length.reshape(c, k), nbrow=nbrow.reshape(c, k),
        nlbyte=nlbyte.reshape(c, k), ok=ok.reshape(c, k),
        blocks=fixed.reshape(c, k, 8, 255),
        rs_counts=counts.reshape(c, k, 8),
        consumed=consumed.reshape(c, k),
    )


_device_decode_jit = jax.jit(
    _device_decode, static_argnames=("max_candidates", "max_symbols")
)


def burst_span_samples(consumed_bits: int, of: float) -> int:
    """Decimated samples from trigger to last consumed symbol."""
    clk0 = int(np.clip(np.floor(of + 0.5), 0, 12))
    s1 = (32 - clk0 + 3) // 4
    nsym = -(-(25 + consumed_bits) // 3)
    return s1 + 8 * (nsym - 1)


class Pipeline:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.sdrclk = cfg.resolved_sdrclk()
        if cfg.fc_hz is None:
            from .io.sdr import choose_fc

            cfg.fc_hz = choose_fc([int(f) for f in cfg.freqs_hz], cfg.fs)
        if cfg.real_input:
            f0 = cfg.fc_hz + cfg.fs / 4
        else:
            f0 = cfg.fc_hz
        self.f_offsets = [f - f0 for f in cfg.freqs_hz]
        self.channelizer = Channelizer(
            self.f_offsets,
            fs=cfg.fs,
            sdrclk=self.sdrclk,
            lo_wrap=cfg.lo_wrap,
            real_input=cfg.real_input,
        )
        self._sharded = None
        if cfg.mesh is not None:
            from .parallel.sharding import ShardedDecoder

            self._sharded = ShardedDecoder(
                cfg.mesh,
                max_candidates=cfg.max_candidates,
                max_symbols=cfg.max_symbols,
            )

    # -- single-shot decode of a full capture --------------------------------
    def decode_wideband(self, x: np.ndarray) -> list[DecodedBurst]:
        p_in = self.channelizer.p_in
        t = len(x)
        if t % p_in:
            x = np.pad(x, (0, p_in - t % p_in))
        y = self.channelizer(x)          # (C, T84, 2) device array
        return self.decode_channels(y)

    def decode_channels(self, y: np.ndarray) -> list[DecodedBurst]:
        """y: (C, T) complex or (C, T, 2) re/im decimated 84 kHz streams."""
        if isinstance(y, np.ndarray) and np.iscomplexobj(y):
            y = pack_complex(y)
        if self._sharded is not None:
            out = self._sharded.decode(y)
        else:
            out = self._decode_block(jnp.asarray(y, dtype=jnp.float32))
        return self._finish(out, t_offset=0)

    def _decode_block(self, y: jnp.ndarray):
        res = _device_decode_jit(
            y, self.cfg.max_candidates, self.cfg.max_symbols
        )
        return jax.tree.map(np.asarray, res)

    # -- streaming -----------------------------------------------------------
    def stream_wideband(self, x: np.ndarray, block_seconds: float = 4.0):
        """Decode a long capture in fixed-size overlapping blocks.

        Yields lists of DecodedBurst per block.  Burst ownership: the block
        whose core region contains the sync trigger; a right-margin of one
        max burst window lets owned bursts complete past the core edge, and
        cross-block greedy state prevents re-decoding a burst that re-syncs
        inside a previous block's span.
        """
        p_in = self.channelizer.p_in
        t = len(x) - len(x) % p_in
        step_raw = max(p_in, int(block_seconds * self.cfg.fs) // p_in * p_in)
        ys = []
        for i in range(0, t, step_raw):
            ys.append(np.asarray(self.channelizer(x[i : min(i + step_raw, t)])))
        if not ys:
            return
        y = np.concatenate(ys, axis=1)
        yield from self.stream_channels(y)

    def stream_channels(self, y: np.ndarray, core_len: int | None = None):
        if isinstance(y, np.ndarray) and np.iscomplexobj(y):
            y = pack_complex(y)
        c, t = y.shape[:2]
        lmargin = 160
        rmargin = 24 + 8 * self.cfg.max_symbols
        if core_len is None:
            core_len = max(8400, min(t, 4 * 84000))
        prev_end = {ci: -1 for ci in range(c)}
        for i in range(0, t, core_len):
            seg = np.zeros((c, lmargin + core_len + rmargin, 2), dtype=np.float32)
            lo = i - lmargin
            hi = i + core_len + rmargin
            src_lo, src_hi = max(lo, 0), min(hi, t)
            seg[:, src_lo - lo : src_lo - lo + (src_hi - src_lo)] = y[:, src_lo:src_hi]
            out = self._decode_block(jnp.asarray(seg))
            # ownership: trigger inside the core region
            t0l = out["t0"]
            out["valid"] = out["valid"] & (t0l >= lmargin) & (t0l < lmargin + core_len)
            yield self._finish(out, t_offset=i - lmargin, prev_end=prev_end)

    # -- host finisher -------------------------------------------------------
    def _finish(
        self, res, t_offset: int, prev_end: dict[int, int] | None = None
    ) -> list[DecodedBurst]:
        bursts: list[DecodedBurst] = []
        c, k = res["t0"].shape
        if prev_end is None:
            prev_end = {ci: -1 for ci in range(c)}
        for ci in range(c):
            for ki in range(k):
                if not res["valid"][ci, ki]:
                    continue
                t0 = int(res["t0"][ci, ki]) + t_offset    # global index
                if t0 <= prev_end[ci]:
                    continue          # inside the previous burst: the serial
                                      # decoder would not be in WSYNC here
                if not res["ok"][ci, ki]:
                    continue
                consumed = int(res["consumed"][ci, ki])
                of = float(res["of"][ci, ki])
                span = burst_span_samples(consumed, of)
                nbrow = int(res["nbrow"][ci, ki])
                nlbyte = int(res["nlbyte"][ci, ki])
                block = res["blocks"][ci, ki, :nbrow]
                counts = [int(v) for v in res["rs_counts"][ci, ki, :nbrow]]
                df = float(res["df"][ci, ki])
                fr_hz = self.cfg.freqs_hz[ci] if ci < len(self.cfg.freqs_hz) else 0.0
                ppm = 10500.0 * df / (TWO_PI * fr_hz) * 1e6 if fr_hz else 0.0
                burst = DecodedBurst(
                    channel=ci,
                    t0=t0,
                    time_s=t0 / DEMOD_RATE,
                    freq_hz=fr_hz,
                    ppm=ppm,
                    length_bits=int(res["length"][ci, ki]),
                    nbrow=nbrow,
                    nlbyte=nlbyte,
                    block=block,
                    rs_counts=counts,
                )
                burst.frames = deframe_corrected(block, nbrow, nlbyte)
                # occupy the span either way: the serial decoder was busy
                # decoding this burst whether or not its CRCs passed
                prev_end[ci] = t0 + span
                bursts.append(burst)
        return bursts


def deframe_corrected(block: np.ndarray, nbrow: int, nlbyte: int) -> list[np.ndarray]:
    """HDLC unstuff + flag scan + CRC over an RS-corrected block."""
    un = Unstuffer()
    for r in range(nbrow):
        by = nlbyte if r == nbrow - 1 else RS_K
        for i in range(by):
            un.push_byte(int(block[r, i]))
    return [f for f in un.frames if frame_crc_ok(f)]
