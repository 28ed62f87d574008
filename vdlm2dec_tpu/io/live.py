"""Live/streaming input: read IQ blocks from a pipe or growing file.

The reference links librtlsdr/libairspy directly; the TPU decoder instead
consumes the standard SDR tool pipelines:

    rtl_sdr -f 136900000 -s 2000000 -g 45 - | vdlm2t 136.975 --iq - ...
    airspy_rx -r /dev/stdout -f 136.8 -a 6000000 ... | vdlm2t ... --iq -

Blocks are sized to the decode pipeline's streaming core; partial tails are
carried between reads.
"""
from __future__ import annotations

import sys
from typing import Iterator

import numpy as np

from .sdr import RTL_DC_OFFSET

_BYTES_PER_SAMPLE = {"cu8": 2, "cs16": 4, "cf32": 8, "f32real": 4}


def stream_blocks(
    source, fmt: str, samples_per_block: int
) -> Iterator[np.ndarray]:
    """Yield fixed-size sample blocks from a binary stream.

    source: file-like with .read(n) (use sys.stdin.buffer for '-'), or a
    path.  The final partial block is zero-padded and yielded last.
    """
    own = False
    if isinstance(source, str):
        if source == "-":
            fh = sys.stdin.buffer
        else:
            fh = open(source, "rb")
            own = True
    else:
        fh = source
    bps = _BYTES_PER_SAMPLE[fmt]
    want = samples_per_block * bps
    carry = b""
    try:
        while True:
            chunk = fh.read(want - len(carry))
            if not chunk:
                break
            carry += chunk
            if len(carry) < want:
                continue
            yield _convert(carry, fmt)
            carry = b""
        if carry:
            carry += b"\x00" * (want - len(carry))
            yield _convert(carry, fmt)
    finally:
        if own:
            fh.close()


def _convert(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "cu8":
        raw = np.frombuffer(buf, dtype=np.uint8).astype(np.float32) - RTL_DC_OFFSET
        return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    if fmt == "cs16":
        raw = np.frombuffer(buf, dtype=np.int16).astype(np.float32)
        return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    if fmt == "cf32":
        raw = np.frombuffer(buf, dtype=np.float32)
        return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    if fmt == "f32real":
        return np.frombuffer(buf, dtype=np.float32).copy()
    raise ValueError(fmt)


def stream_raw_u8(source, samples_per_block: int) -> Iterator[np.ndarray]:
    """cu8 fast path: yield raw interleaved uint8 blocks (device converts)."""
    if isinstance(source, str):
        fh = sys.stdin.buffer if source == "-" else open(source, "rb")
    else:
        fh = source
    want = samples_per_block * 2
    carry = b""
    while True:
        chunk = fh.read(want - len(carry))
        if not chunk:
            break
        carry += chunk
        if len(carry) < want:
            continue
        yield np.frombuffer(carry, dtype=np.uint8)
        carry = b""
    if carry:
        carry += b"\x7f" * (want - len(carry))
        yield np.frombuffer(carry, dtype=np.uint8)
