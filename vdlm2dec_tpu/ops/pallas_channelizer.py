"""Pallas TPU kernel: fused u8-convert + mix + integrate-dump channelizer.

One kernel does what the XLA path spells out as convert -> 4 elementwise
(C, B, P_in) f32 intermediates -> einsum: the u8 tile is converted, mixed
with the per-channel LO and matmul'd with the aggregation matrix entirely in
VMEM, so the (C, B, P_in) mixed intermediates never touch HBM.
Grid: (channel, period-tile).

The per-period LO phase is constant within a period, so it commutes with
the aggregation matmul and is applied afterwards on the (C, B, P_out)
output by XLA (with the reference's wrapped LO table it is identically 1).

Inputs (see ops/channelizer.py for the math):
  xr, xi   (B, P_in) uint8      deinterleaved raw IQ
  lo_r/i   (C, P_in) f32        per-channel base LO over one period
  ph_r/i   (C, B)   f32         per-period phase (applied post-kernel)
  a        (P_in, P_out) f32    integrate-and-dump aggregation
Output:
  y        (C, B, P_out, 2) f32
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 32          # periods per kernel instance (u8 sublane alignment)


def _kernel(xr_ref, xi_ref, lor_ref, loi_ref, a_ref, dc_ref, out_ref):
    dc = dc_ref[0]
    # Mosaic can't cast u8 -> f32 directly; go through int32
    xr = xr_ref[:].astype(jnp.int32).astype(jnp.float32) - dc
    xi = xi_ref[:].astype(jnp.int32).astype(jnp.float32) - dc
    lor = lor_ref[0, 0]                    # (P_in,)
    loi = loi_ref[0, 0]
    mr = xr * lor[None, :] - xi * loi[None, :]
    mi = xr * loi[None, :] + xi * lor[None, :]
    a = a_ref[:]
    out_ref[0, :, :, 0] = jax.lax.dot_general(
        mr, a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0, :, :, 1] = jax.lax.dot_general(
        mi, a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def channelize_u8_pallas(xr, xi, lo_r, lo_i, ph_r, ph_i, a, dc,
                         interpret=False):
    """(B, P_in) u8 pair -> (C, B, P_out, 2) f32."""
    b, p_in = xr.shape
    c = lo_r.shape[0]
    p_out = a.shape[1]
    assert b % B_TILE == 0, f"B={b} must be a multiple of {B_TILE}"
    grid = (c, b // B_TILE)
    y = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, p_in), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, p_in), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_in), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_in), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_in, p_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B_TILE, p_out, 2), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, b, p_out, 2), jnp.float32),
        interpret=interpret,
    )(xr, xi, lo_r[:, None, :], lo_i[:, None, :], a, dc)
    # post-kernel period phase (elementwise on the 24x-decimated output)
    yr, yi = y[..., 0], y[..., 1]
    zr = yr * ph_r[:, :, None] - yi * ph_i[:, :, None]
    zi = yr * ph_i[:, :, None] + yi * ph_r[:, :, None]
    return jnp.stack([zr, zi], axis=-1)
