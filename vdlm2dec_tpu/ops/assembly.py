"""Burst bit/byte assembly: bits -> bytes -> deinterleaved RS block.

The reference fills a (rows, 255) block column-major while zero-padding the
shortened last row (putbit GETDATA/GETFEC, d8psk.c:117-205).  Block-parallel
equivalent: the mapping  transmitted-byte-index -> (row, col)  is a pure
function of (nbrow, nlbyte), so we precompute, for every geometry, the
*inverse* map  (row, col) -> byte index (or -1 for zero-padded cells)  and
deinterleave with a single gather.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import MAX_ROWS, RS_K, RS_N, RS_ROOTS

MAX_TX_BYTES = MAX_ROWS * RS_N            # 2040
_N_GEOM = (MAX_ROWS + 1) * 250            # nbrow 0..8, nlbyte 0..249


def _fec_geometry_np(nbrow: np.ndarray, nlbyte: np.ndarray):
    """Vectorised fec reclassification (d8psk.c:153-162)."""
    fec_rows = np.where(nlbyte <= 2, nbrow - 1, nbrow)
    fec_nl = np.where(
        nlbyte <= 2, 0, np.where(nlbyte <= 30, 2, np.where(nlbyte <= 67, 4, 0))
    )
    return fec_rows, fec_nl


@functools.lru_cache(maxsize=1)
def inverse_fill_tables() -> tuple[np.ndarray, np.ndarray]:
    """(G, 8, 255) int16 inverse fill map + (G,) int32 consumed-byte counts.

    Entry [g, r, c] = index into the transmitted-byte stream that fills cell
    (r, c), or -1 when the cell is zero-padded / absent.  g = nbrow*250 +
    nlbyte.
    """
    inv = np.full((_N_GEOM, MAX_ROWS, RS_N), -1, dtype=np.int16)
    counts = np.zeros(_N_GEOM, dtype=np.int32)
    for nbrow in range(1, MAX_ROWS + 1):
        for nlbyte in range(250):
            g = nbrow * 250 + nlbyte
            # data columns: mask[c, r] = transmitted
            rows = np.arange(nbrow)
            mask_d = np.ones((RS_K, nbrow), dtype=bool)
            if nlbyte:
                mask_d[nlbyte:, nbrow - 1] = False
            fec_rows, fec_nl = _fec_geometry_np(np.array(nbrow), np.array(nlbyte))
            fec_rows, fec_nl = int(fec_rows), int(fec_nl)
            mask_f = np.zeros((RS_ROOTS, MAX_ROWS), dtype=bool)
            if fec_rows > 0:
                mask_f[:, :fec_rows] = True
                if fec_nl:
                    mask_f[fec_nl:, fec_rows - 1] = False
            flat = np.concatenate([mask_d.ravel(), mask_f[:, :].ravel()])
            k = np.cumsum(flat) - 1
            counts[g] = flat.sum()
            # scatter back
            kd = k[: RS_K * nbrow].reshape(RS_K, nbrow)
            inv[g, :nbrow, :RS_K] = np.where(mask_d, kd, -1).T
            kf = k[RS_K * nbrow :].reshape(RS_ROOTS, MAX_ROWS)
            inv[g, :, RS_K:] = np.where(mask_f, kf, -1).T
    return inv, counts


@functools.partial(jax.jit)
def assemble_blocks(
    soft_data: jnp.ndarray, nbrow: jnp.ndarray, nlbyte: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """soft_data: (N, >=8*MAX_TX_BYTES) descrambled soft bits after the
    header.  Returns (blocks (N, 8, 255) uint8, consumed_bits (N,)).
    """
    n = soft_data.shape[0]
    hard = (soft_data[:, : 8 * MAX_TX_BYTES] > 0.5).astype(jnp.uint8)
    bits = hard.reshape(n, MAX_TX_BYTES, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).astype(jnp.int32)
    tx_bytes = jnp.sum(bits.astype(jnp.int32) * weights[None, None, :], axis=-1)

    inv_np, counts_np = inverse_fill_tables()
    inv = jnp.asarray(inv_np)
    counts = jnp.asarray(counts_np)
    g = (nbrow * 250 + nlbyte).astype(jnp.int32)
    gmap = inv[g].astype(jnp.int32)                    # (N, 8, 255)
    safe = jnp.maximum(gmap, 0)
    vals = jnp.take_along_axis(
        tx_bytes, safe.reshape(n, -1), axis=1
    ).reshape(n, MAX_ROWS, RS_N)
    blocks = jnp.where(gmap >= 0, vals, 0).astype(jnp.uint8)
    return blocks, 8 * counts[g]
