"""Halo-tiled fused residual-layer kernel (VQ-VAE hot path).

The round-5 per-level training roofline (BASELINE.md, tools/
roofline_vqvae.py) found the two 80³-scale residual stacks are 61% of
the b1 VQ-VAE train step, each running at the SUM of its MXU and HBM
ideals: XLA cannot fuse a conv→relu→conv chain, so every layer makes
~7 full-activation HBM passes (x in, h out, h in, h2 out, x in again
for the residual, y out) and alternates matmul phases with
bandwidth-bound elementwise/layout phases.

This kernel computes one whole residual layer —

    y = relu(x + W2·relu(W1 * x + b1) + b2)      (* = 3³ conv, · = 1³)

(reference baseline.py:150-160, the ``use_slim_residual`` form) — in
one pass: read x once, write y once.  Design:

- channels-last (B, D, H, W, C) with C in lanes; the 3³ conv is 27
  accumulated (M, C)@(C, R) MXU matmuls, one per tap, M = tz·ty·W
  spatial rows per tile;
- halo handling is MANUAL DMA: x stays in HBM (``memory_space=ANY``)
  and each grid step copies its (tz+2, ty+2, W+2, C) window into VMEM
  scratch (BlockSpecs cannot express overlapping windows).  The three
  w-shifts are VALUE-level vector slices of the loaded window stored
  back into tile-aligned scratch — Mosaic rejects ``tpu.memref_slice``
  at sublane offsets 1/2, so neither a pre-shifted HBM DMA nor a
  shifted ref load compiles (probed on-chip, round 5);
- z/y tap offsets are leading-dim slices of the shifted windows
  (free); the (tz, ty, W, C) → (M, C) reshape merges whole-vreg rows
  only (the 128-lane-aligned case Mosaic accepts);
- x is zero-padded by 1 voxel in XLA before the call, so the kernel
  has no boundary cases (the pad is one fused elementwise pass,
  amortized over the ~7 passes it replaces); the padded W extent is
  rounded up to a multiple of 8 because the window DMA's sublane dim
  must be tile-aligned (Mosaic rejects an 82-row HBM slice);
- rounding mirrors the module path bit-for-bit-in-spirit: f32 MXU
  accumulation, conv outputs rounded to the compute dtype BEFORE the
  bias add, bias/relu/residual in compute dtype — exactly what
  TorchConv3d → nn.relu does (models/vqvae.py:147-169).

The backward stays in XLA (custom_vjp over the reference expression —
recompute-everything, the remat-friendly choice; a fused backward
kernel is the follow-up lever).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_residual_layer",
    "residual_layer_reference",
    "supports_fused_residual",
]

_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


# --------------------------------------------------------------- tiles


def _pick_tiles(D: int, H: int, W: int, C: int, R: int,
                budget: int = 10 * 1024 * 1024):
    """Largest-M (tz, ty) dividing (D, H) whose live VMEM set fits the
    budget (3 shifted windows + double-buffered out + weights + f32
    accumulator + h), preferring lower halo read amplification."""
    wp = -(-(W + 2) // 8) * 8
    best = None
    for tz in (t for t in range(1, D + 1) if D % t == 0):
        for ty in (t for t in range(1, H + 1) if H % t == 0):
            m = tz * ty * W
            window = (3 * W + wp) * (tz + 2) * (ty + 2) * C * 2
            out = 2 * tz * ty * W * C * 2
            acc = m * max(C, R) * 4
            h = m * R * 2
            wts = 27 * C * R * 2 + R * C * 2
            if window + out + acc + h + wts > budget or m < 1024:
                continue
            amp = (tz + 2) * (ty + 2) / (tz * ty)
            score = (m, -amp)
            if best is None or score > best[0]:
                best = (score, tz, ty)
    return None if best is None else (best[1], best[2])


def supports_fused_residual(x_shape, res_channels: int) -> bool:
    """Gate: lanes-aligned channels, sublane-aligned W, a tile fits."""
    if len(x_shape) != 5:
        return False
    _, D, H, W, C = x_shape
    if C % 128 or res_channels % 128 or W % 8:
        return False
    return _pick_tiles(D, H, W, C, res_channels) is not None


# --------------------------------------------------------------- kernel


def _res_kernel(x_hbm, w1, b1, w2, b2, out, shifted,
                *, tz: int, ty: int, W: int, Wp: int, C: int, R: int):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    z0 = zi * tz
    y0 = yi * ty
    dt = out.dtype

    # one aligned (tz+2, ty+2, W+2, C) window DMA; the three w-shifts
    # happen at VALUE level (vector relayout — Mosaic rejects
    # tpu.memref_slice at sublane offsets 1/2, so neither a shifted
    # HBM DMA nor a shifted ref load compiles; a full load + vector
    # slice does) and land in tile-aligned scratch so the 27 tap reads
    # below slice leading dims only
    def body(win, wsem):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :, :],
            win,
            wsem,
        )
        cp.start()
        cp.wait()
        wv = win[:]
        for dx in range(3):
            shifted[dx] = wv[:, :, dx:dx + W, :]

    pl.run_scoped(
        body,
        pltpu.VMEM((tz + 2, ty + 2, Wp, C), shifted.dtype),
        pltpu.SemaphoreType.DMA(()),
    )

    M = tz * ty * W
    acc = None
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                a = shifted[dx, dz:dz + tz, dy:dy + ty].reshape(M, C)
                t = lax.dot(
                    a, w1[(dz * 3 + dy) * 3 + dx],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
    # mirror the module rounding: conv out → dt, then +bias, then relu
    h = jnp.maximum(acc.astype(dt) + b1[0, :], 0.0)
    y2 = lax.dot(h, w2[:], preferred_element_type=jnp.float32)
    center = shifted[1, 1:1 + tz, 1:1 + ty].reshape(M, C)
    y = jnp.maximum(y2.astype(dt) + b2[0, :] + center, 0.0)
    out[0] = y.reshape(tz, ty, W, C)


def _fused_forward(x, w1, b1, w2, b2, *, interpret: bool):
    B, D, H, W, C = x.shape
    R = w1.shape[-1]
    tiles = _pick_tiles(D, H, W, C, R)
    if tiles is None:
        raise ValueError(f"no VMEM tile fits {x.shape}")
    tz, ty = tiles

    Wp = -(-(W + 2) // 8) * 8  # window DMA sublane dim must be 8-aligned
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1), (0, 0)))
    w1f = w1.reshape(27, C, R).astype(x.dtype)
    w2c = w2.astype(x.dtype)
    b1p = jnp.broadcast_to(b1.reshape(1, R).astype(x.dtype), (8, R))
    b2p = jnp.broadcast_to(b2.reshape(1, C).astype(x.dtype), (8, C))

    kern = functools.partial(
        _res_kernel, tz=tz, ty=ty, W=W, Wp=Wp, C=C, R=R,
    )
    return pl.pallas_call(
        kern,
        grid=(B, D // tz, H // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, C, R), lambda b, z, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, R), lambda b, z, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda b, z, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda b, z, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, W, C), lambda b, z, y: (b, z, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tz + 2, ty + 2, W, C), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * C * R * 28,
            bytes_accessed=2 * B * D * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w1f, b1p, w2c, b2p)


# ----------------------------------------------------- reference / vjp


def residual_layer_reference(x, w1, b1, w2, b2):
    """The same math in plain XLA with the exact module rounding
    (models/vqvae.py:158-169: TorchConv3d casts kernel+bias to the
    compute dtype, the conv output is compute-dtype, bias adds and
    relus are compute-dtype).  Used for exactness tests and as the
    custom_vjp backward's recompute expression."""
    dt = x.dtype
    h = lax.conv_general_dilated(
        x, w1.astype(dt), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=_DN,
    )
    h = jnp.maximum(h + b1.astype(dt), 0.0)
    y = lax.conv_general_dilated(
        h, w2.reshape((1, 1, 1) + w2.shape).astype(dt),
        (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=_DN,
    )
    return jnp.maximum(y + b2.astype(dt) + x, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_residual_layer(x, w1, b1, w2, b2, interpret: bool = False):
    """y = relu(x + conv1³(relu(conv3³(x) + b1)) + b2), fused.

    x: (B, D, H, W, C) channels-last; w1: (3, 3, 3, C, R) DHWIO;
    b1: (R,); w2: (R, C); b2: (C,).  Forward runs the halo-tiled
    Pallas kernel; backward is XLA via ``jax.vjp`` over the reference
    expression (full recompute — no saved intermediates, remat-safe)."""
    return _fused_forward(x, w1, b1, w2, b2, interpret=interpret)


def _fwd(x, w1, b1, w2, b2, interpret):
    y = fused_residual_layer(x, w1, b1, w2, b2, interpret)
    return y, (x, w1, b1, w2, b2)


def _bwd(interpret, res, gy):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(residual_layer_reference, x, w1, b1, w2, b2)
    return vjp(gy)


fused_residual_layer.defvjp(_fwd, _bwd)
