"""Pallas TPU kernel: fused phase-0 matched filter + sync scan.

The XLA path materializes the full polyphase filter output f = (C, 4, T, 2)
f32 in HBM (~1 GB per 2 s 8-channel block), reads 1/8th of it back to get
the phase-0 stream, then builds (C, 17, T) sync windows (another ~17x T
traffic through the unwrap/slope/residual chain).  Yet the sync metric
depends only on y through 17 filter taps and 17 symbol-spaced phases —
perfectly local.  This kernel computes err/fr straight from the decimated
(C, T) stream in VMEM: per (channel-tile, time-tile) it DMAs the tile plus
a 144-sample left halo (16 filter ring + 128 sync history), applies the
17-tap phase-0 filter, takes atan2, and runs the exact unwrap -> mean ->
LS slope -> residual recurrence of ops.demod._sync_scan_core
(d8psk.c:258-289 semantics) with everything unrolled on the VPU.

Combined with the inline per-candidate filter in ops.demod
(demod_candidates_inline), f never exists in HBM at all: the whole sync +
demod path reads y once.

Numerics: same f32 operations in the same order as the XLA path except
the filter accumulation (shifted adds vs conv) — err/fr agree to ~1e-5
relative; parity is asserted at the frame level plus allclose on the
metric (tests/test_fused_sync.py).
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import POLYPHASE, SYNC_PHASES

PI = math.pi
TWO_PI = 2.0 * math.pi

C_TILE = 8            # f32 sublane tile
T_TILE = 1024         # lanes per instance (multiple of 128)
# the window needs 144 history samples (128 sync + 16 filter ring), but
# Mosaic DMA slice lengths must be lane-aligned (128), so the halo is
# padded to 256 and in-window offsets shift by 112
HALO = 256
SKEW = HALO - 144     # 112 unused leading samples per window
_SLOPE_NORM = 408.0   # sum_l (l-8)^2 (d8psk.c:283)

_TAP0 = tuple(float(v) for v in POLYPHASE[0])          # 17 taps, phase 0
_SW = tuple(float(v) for v in SYNC_PHASES)             # 17 sync phases


def _atan2(y, x):
    """Branch-free f32 atan2 (Mosaic has no atan/atan2 primitive).

    Cephes atanf reduction: fold into [0, 1] by |y|/|x| swap, then the
    t > tan(pi/8) half-angle reduction, then the degree-4 minimax
    polynomial in t^2 — ~1 ulp over the reduced range.  Quadrants
    restored from the signs of x and y (the measure-zero signed-zero
    corner differs from IEEE atan2; the phases here come from filtered
    noise, never exact -0.0 with negative real)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    z = num / jnp.where(den == 0.0, 1.0, den)         # [0, 1]
    red = z > 0.4142135623730950
    zr = jnp.where(red, (z - 1.0) / (z + 1.0), z)
    w = zr * zr
    p = ((8.05374449538e-2 * w - 1.38776856032e-1) * w
         + 1.99777106478e-1) * w - 3.33329491539e-1
    r = zr + zr * w * p
    r = jnp.where(red, r + 0.7853981633974483, r)
    r = jnp.where(swap, 1.5707963267948966 - r, r)
    r = jnp.where(den == 0.0, 0.0, r)
    r = jnp.where(x < 0.0, PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _kernel(yr_hbm, yi_hbm, err_ref, fr_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(yr_s, yi_s, sems):
        cp_r = pltpu.make_async_copy(
            yr_hbm.at[pl.ds(i * C_TILE, C_TILE),
                      pl.ds(j * T_TILE, T_TILE + HALO)],
            yr_s, sems.at[0],
        )
        cp_i = pltpu.make_async_copy(
            yi_hbm.at[pl.ds(i * C_TILE, C_TILE),
                      pl.ds(j * T_TILE, T_TILE + HALO)],
            yi_s, sems.at[1],
        )
        cp_r.start()
        cp_i.start()
        cp_r.wait()
        cp_i.wait()
        yr = yr_s[:]
        yi = yi_s[:]
        # phase-0 filter at positions u in [0, T_TILE+128): stream position
        # j*T_TILE - 128 + u, whose 17-tap ring starts at scratch index
        # SKEW + u (scratch[0] = y[j*T_TILE - HALO])
        span = T_TILE + 128
        fr_acc = yr[:, SKEW : SKEW + span] * _TAP0[0]
        fi_acc = yi[:, SKEW : SKEW + span] * _TAP0[0]
        for k in range(1, 17):
            fr_acc = fr_acc + yr[:, SKEW + k : SKEW + k + span] * _TAP0[k]
            fi_acc = fi_acc + yi[:, SKEW + k : SKEW + k + span] * _TAP0[k]
        p0 = _atan2(fi_acc, fr_acc)                     # (C_TILE, span)
        # 17 symbol-spaced phases per output position (stride 8), then the
        # exact unwrap -> mean -> slope -> residual of _sync_scan_core
        a = [p0[:, 8 * k : 8 * k + T_TILE] - _SW[k] for k in range(17)]
        pr = [a[0]]
        cum = jnp.zeros_like(a[0])
        for k in range(1, 17):
            pd = a[k] - a[k - 1]
            step = jnp.where(pd > PI, -TWO_PI,
                             jnp.where(pd < -PI, TWO_PI, 0.0))
            cum = cum + step
            pr.append(a[k] + cum)
        m = pr[0]
        for k in range(1, 17):
            m = m + pr[k]
        m = m * (1.0 / 17.0)
        fr_num = jnp.zeros_like(m)
        for k in range(17):
            fr_num = fr_num + (pr[k] - m) * float(k - 8)
        fr = fr_num * (1.0 / _SLOPE_NORM)
        err = jnp.zeros_like(m)
        for k in range(17):
            e = (pr[k] - m) - float(k - 8) * fr
            err = err + e * e
        err_ref[:] = err
        fr_ref[:] = fr

    pl.run_scoped(
        body,
        pltpu.VMEM((C_TILE, T_TILE + HALO), jnp.float32),
        pltpu.VMEM((C_TILE, T_TILE + HALO), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def sync_scan_pallas(y: jnp.ndarray, interpret: bool | None = None):
    """(C, T, 2) decimated stream -> (err, fr) each (C, T), matching
    ops.demod.sync_scan(phase_of(polyphase_filter(y)[:, 0])) without ever
    materializing the filter output.  interpret=None auto-selects the
    Pallas interpreter on the CPU backend (tests)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _sync_scan_pallas(y, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sync_scan_pallas(y: jnp.ndarray, interpret: bool = False):
    c, t, _ = y.shape
    cp = -(-c // C_TILE) * C_TILE
    tp = -(-t // T_TILE) * T_TILE
    # left pad = HALO (zero history, like the XLA path's zero padding);
    # right pad up to the tile grid
    yr = jnp.pad(y[..., 0], ((0, cp - c), (HALO, tp - t)))
    yi = jnp.pad(y[..., 1], ((0, cp - c), (HALO, tp - t)))
    err, fr = pl.pallas_call(
        _kernel,
        grid=(cp // C_TILE, tp // T_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C_TILE, T_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_TILE, T_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, tp), jnp.float32),
            jax.ShapeDtypeStruct((cp, tp), jnp.float32),
        ],
        interpret=interpret,
    )(yr, yi)
    return err[:c, :t], fr[:c, :t]
