"""Differential tests: native C++ host decoder vs pure Python oracle."""
import numpy as np
import pytest

from vdlm2dec_tpu.golden import codec
from vdlm2dec_tpu.host.native import (
    deframe_batch_native,
    deframe_block_native,
    get_lib,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


def _python_deframe(block, nbrow, nlbyte):
    un = codec.Unstuffer()
    for r in range(nbrow):
        by = nlbyte if r == nbrow - 1 else 249
        for i in range(by):
            un.push_byte(int(block[r, i]))
    return [f for f in un.frames if codec.frame_crc_ok(f)]


def _random_block(rng, nbrow, nlbyte, with_frame=True):
    block = np.zeros((nbrow, 255), dtype=np.uint8)
    if with_frame:
        content = rng.integers(0, 256, int(rng.integers(11, 60))).astype(np.uint8)
        nbytes = 249 * (nbrow - 1) + (nlbyte if nlbyte else 249)
        bits = codec.build_burst_bitstream([content], pad_to=nbytes * 8)
        data = np.packbits(
            np.array(bits, dtype=np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).ravel()
        k = 0
        for r in range(nbrow):
            by = nlbyte if r == nbrow - 1 else 249
            block[r, :by] = data[k : k + by]
            k += by
    else:
        block[:, :] = rng.integers(0, 256, (nbrow, 255))
    return block


def test_native_matches_python_clean_frames():
    rng = np.random.default_rng(0)
    for trial in range(20):
        nbrow = int(rng.integers(1, 4))
        nlbyte = int(rng.integers(60, 250)) if nbrow >= 1 else 0
        block = _random_block(rng, nbrow, nlbyte)
        py = _python_deframe(block, nbrow, nlbyte)
        nat = deframe_block_native(block, nbrow, nlbyte)
        assert len(nat) == len(py) >= 1
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(a, b)


def test_native_matches_python_garbage():
    rng = np.random.default_rng(1)
    for trial in range(30):
        nbrow = int(rng.integers(1, 9))
        nlbyte = int(rng.integers(0, 250))
        block = _random_block(rng, nbrow, nlbyte, with_frame=False)
        py = _python_deframe(block, nbrow, nlbyte)
        nat = deframe_block_native(block, nbrow, nlbyte)
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(a, b)


def test_native_batch():
    rng = np.random.default_rng(2)
    blocks, nbrows, nlbytes, want = [], [], [], []
    for trial in range(12):
        nbrow = int(rng.integers(1, 4))
        nlbyte = int(rng.integers(60, 250))
        b8 = np.zeros((8, 255), dtype=np.uint8)
        blk = _random_block(rng, nbrow, nlbyte, with_frame=(trial % 3 != 2))
        b8[:nbrow] = blk
        blocks.append(b8)
        nbrows.append(nbrow)
        nlbytes.append(nlbyte)
        want.append(_python_deframe(blk, nbrow, nlbyte))
    res = deframe_batch_native(
        np.stack(blocks), np.array(nbrows), np.array(nlbytes)
    )
    for i in range(len(blocks)):
        assert len(res[i]) == len(want[i])
        for a, b in zip(res[i], want[i]):
            np.testing.assert_array_equal(a, b)
