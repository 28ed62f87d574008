"""Batched ML decode of the (25,20) burst-header block code.

The reference's "viterbi" (viterbi.c:23-96) is an exhaustive max-product
trellis over the 32 parity-syndrome states.  Here it runs in log domain as a
static 25-step lax.scan over a (N, 32) batch: each step is a gather by the
fixed permutation s -> s ^ H[n] plus an elementwise max.  Traceback is a
second 25-step scan over the stored decisions.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import HEADER_BITS, HEADER_H, HEADER_STATES, MAX_ROWS, ROW_DATA_BITS

_NEG = -1e30

# permutation per step: state s receives its bit-1 path from s ^ H[n]
_PERM = np.stack([np.arange(HEADER_STATES) ^ int(h) for h in HEADER_H])  # (25, 32)

# bit-reversal of the 17-bit length field happens on bit-extraction order;
# see header_decode below.


@functools.partial(jax.jit)
def header_decode(soft: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """soft: (N, 25) P(bit=1).  Returns (length, nbrow, nlbyte, ok).

    ok is False when the decoded length is rejected (len < 96 or nbrow > 8,
    d8psk.c:97-107).
    """
    n = soft.shape[0]
    v = soft.astype(jnp.float32)
    # first 3 bits forced to 0 (d8psk.c:81-82)
    v = v.at[:, :3].set(0.0)
    l1 = jnp.log(jnp.clip(v, 1e-37, 1.0))
    l0 = jnp.log(jnp.clip(1.0 - v, 1e-37, 1.0))

    perm = jnp.asarray(_PERM)

    # derive the initial carry from the (possibly sharded) input so its
    # varying-manual-axes match inside shard_map
    init = jnp.where(
        jnp.arange(HEADER_STATES)[None, :] == 0, 0.0, _NEG
    ).astype(jnp.float32) + 0.0 * l1[:, :1]

    states = jnp.arange(HEADER_STATES)

    def step(p, inputs):
        pm, lp1, lp0 = inputs              # (32,), (N,), (N,)
        one = p[:, pm] + lp1[:, None]      # path arriving via bit 1
        zero = p + lp0[:, None]
        nxt = jnp.maximum(one, zero)
        # tie-break replicates viterbi.c's source-state iteration order:
        # for destination d the bit-1 write happens first iff d^H[n] < d,
        # and later writes require a strictly greater metric
        bit = (one > zero) | ((one == zero) & (pm < states)[None, :])
        return nxt, bit

    final, bits = jax.lax.scan(step, init, (perm, l1.T, l0.T))
    # bits: (25, N, 32) decisions; traceback from state 0
    def back(state, inputs):
        bit_n, pm = inputs                 # (N, 32), (32,)
        b = jnp.take_along_axis(bit_n, state[:, None], axis=1)[:, 0]
        prev = jnp.where(b, pm[state], state)
        return prev, b

    s0 = (jnp.argmax(final, axis=1) * 0).astype(jnp.int32)   # varying zero
    _, dec = jax.lax.scan(back, s0, (bits[::-1], perm[::-1]))
    # dec[i] = transmitted bit index 24-i.  Length bits are b3..b19 LSB-first.
    tx = dec[::-1].astype(jnp.int32)       # (25, N), tx[n] = bit n
    weights = jnp.zeros((HEADER_BITS,), dtype=jnp.int32)
    weights = weights.at[3:20].set(1 << np.arange(17))
    length = jnp.sum(tx * weights[:, None], axis=0)

    nbrow = length // ROW_DATA_BITS + 1
    nlbyte = (length % ROW_DATA_BITS + 7) // 8
    ok = (length >= 96) & (nbrow <= MAX_ROWS)
    return length, nbrow, nlbyte, ok
