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

The backward is a second halo-tiled kernel over saved (x, h, y):

    g_r = gy·[y>0];  da = (g_r·W2ᵀ)·[h>0]
    dx  = g_r + conv3ᵀ(da, W1)          (tap-reversed W1ᵀ windows)
    dW1[t] = Σ x_shift(t)ᵀ·da;  dW2 = hᵀ·g_r;  db = Σ g_r / Σ da

reading gy/y/h/x once and writing dx once (XLA's saved-intermediate
backward makes ~12 passes); weight grads accumulate in f32 output
blocks that stay VMEM-resident across the whole grid (constant
index_map).  The forward saves h via a second kernel output only when
differentiated (custom_vjp fwd rule); plain calls skip the write.  A
shape-gate failure falls back to the XLA recompute vjp.
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
            # out accounts for the optional hidden output too (vjp fwd)
            out = 2 * tz * ty * W * (C + R) * 2
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


def _res_kernel(x_hbm, w1, b1, w2, b2, *refs,
                tz: int, ty: int, W: int, Wp: int, C: int, R: int,
                with_hidden: bool = False):
    if with_hidden:
        out, hout, shifted = refs
    else:
        out, shifted = refs
        hout = None
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
    if hout is not None:
        hout[0] = h.reshape(tz, ty, W, R)
    y2 = lax.dot(h, w2[:], preferred_element_type=jnp.float32)
    center = shifted[1, 1:1 + tz, 1:1 + ty].reshape(M, C)
    y = jnp.maximum(y2.astype(dt) + b2[0, :] + center, 0.0)
    out[0] = y.reshape(tz, ty, W, C)


def _fused_forward(x, w1, b1, w2, b2, *, interpret: bool,
                   return_hidden: bool = False):
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
        with_hidden=return_hidden,
    )
    out_shape = [jax.ShapeDtypeStruct((B, D, H, W, C), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, tz, ty, W, C), lambda b, z, y: (b, z, y, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if return_hidden:
        out_shape.append(jax.ShapeDtypeStruct((B, D, H, W, R), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, tz, ty, W, R), lambda b, z, y: (b, z, y, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
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
        out_specs=out_specs if return_hidden else out_specs[0],
        out_shape=out_shape if return_hidden else out_shape[0],
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
    return res


# ------------------------------------------------------ backward kernel


def _pick_tiles_bwd(D: int, H: int, W: int, C: int, R: int,
                    budget: int = 11 * 1024 * 1024):
    """Largest-M (tz, ty) whose backward working set fits VMEM.  The
    two window stages (gy/y/h, then x) are scoped sequentially; the
    shifted-da/x copies, centers, f32 weight-grad blocks and weight
    operands are resident for the whole grid."""
    wp = -(-(W + 2) // 8) * 8
    best = None
    for tz in (t for t in range(1, D + 1) if D % t == 0):
        for ty in (t for t in range(1, H + 1) if H % t == 0):
            m = tz * ty * W
            if m < 512 or m % 8:
                continue
            a = (tz + 2) * (ty + 2)
            resident = (
                3 * a * W * (C + R) * 2      # shifted da + shifted x
                + m * (C + R) * 2            # g_r / h centers
                + 27 * C * R * 4 + R * C * 4 + 8 * (R + C) * 4  # w-grads
                + (27 * R * C + C * R) * 2   # w1r + w2t operands
                + 2 * m * C * 2              # dx out double-buffered
            )
            stage1 = a * wp * (2 * C + R) * 2   # gy + y + h windows
            stage2 = a * wp * C * 2 + m * max(C, R) * 4  # x window + acc
            if resident + max(stage1, stage2) > budget:
                continue
            amp = (tz + 2) * (ty + 2) / (tz * ty)
            score = (m, -amp)
            if best is None or score > best[0]:
                best = (score, tz, ty)
    return None if best is None else (best[1], best[2])


def _res_bwd_kernel(x_hbm, gy_hbm, y_hbm, h_hbm, w2t, w1r,
                    dx_out, dw1_out, dw2_out, db1_out, db2_out,
                    sh_da, sh_x, grc, hc,
                    *, tz: int, ty: int, W: int, Wp: int, C: int, R: int):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    first = (b == 0) & (zi == 0) & (yi == 0)
    z0 = zi * tz
    y0 = yi * ty
    dt = dx_out.dtype
    M = tz * ty * W
    Mw = (tz + 2) * (ty + 2) * Wp
    f32 = jnp.float32

    # stage 1: g_r = gy·[y>0], da = (g_r·W2ᵀ)·[h>0] over the halo
    # window (the dx conv-transpose needs da on the halo; the zero gy
    # pad makes da exactly zero outside the volume)
    def stage1(gyw, yw, hw, sems):
        cps = [
            pltpu.make_async_copy(
                src.at[b, pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :, :],
                dst,
                sems.at[i],
            )
            for i, (dst, src) in enumerate(
                ((gyw, gy_hbm), (yw, y_hbm), (hw, h_hbm))
            )
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        # masks compare in f32: Mosaic has no packed-bf16 cmpf on this
        # target ("Target does not support this comparison", probed)
        grw = jnp.where(
            yw[:].astype(f32) > 0, gyw[:].astype(f32), 0.0
        ).astype(dt)
        dh = lax.dot(grw.reshape(Mw, C), w2t[:], preferred_element_type=f32)
        hwv = hw[:]
        daw = jnp.where(
            hwv.reshape(Mw, R).astype(f32) > 0, dh, 0.0
        ).astype(dt).reshape(tz + 2, ty + 2, Wp, R)
        for s in range(3):
            sh_da[s] = daw[:, :, s:s + W, :]
        grc[:] = grw[1:1 + tz, 1:1 + ty, 1:1 + W, :].reshape(M, C)
        hc[:] = hwv[1:1 + tz, 1:1 + ty, 1:1 + W, :].reshape(M, R)

    pl.run_scoped(
        stage1,
        pltpu.VMEM((tz + 2, ty + 2, Wp, C), dt),
        pltpu.VMEM((tz + 2, ty + 2, Wp, C), dt),
        pltpu.VMEM((tz + 2, ty + 2, Wp, R), dt),
        pltpu.SemaphoreType.DMA((3,)),
    )

    # stage 2: x window (for dW1 taps), same shift trick as the forward
    def stage2(xw, wsem):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(z0, tz + 2), pl.ds(y0, ty + 2), :, :],
            xw,
            wsem,
        )
        cp.start()
        cp.wait()
        wv = xw[:]
        for s in range(3):
            sh_x[s] = wv[:, :, s:s + W, :]

    pl.run_scoped(
        stage2,
        pltpu.VMEM((tz + 2, ty + 2, Wp, C), dt),
        pltpu.SemaphoreType.DMA(()),
    )

    @pl.when(first)
    def _():
        dw1_out[:] = jnp.zeros((27, C, R), f32)
        dw2_out[:] = jnp.zeros((R, C), f32)
        db1_out[:] = jnp.zeros((8, R), f32)
        db2_out[:] = jnp.zeros((8, C), f32)

    # dx = Σ_s da_pad(·+s) · W1[2−s]ᵀ  +  g_r   (tap-reversed conv)
    acc = None
    for sz in range(3):
        for sy in range(3):
            for sx in range(3):
                d = sh_da[sx, sz:sz + tz, sy:sy + ty].reshape(M, R)
                t = lax.dot(
                    d, w1r[(sz * 3 + sy) * 3 + sx],
                    preferred_element_type=f32,
                )
                acc = t if acc is None else acc + t
    dx_out[0] = (acc.astype(dt) + grc[:]).reshape(tz, ty, W, C)

    # weight/bias grads accumulate in the resident f32 output blocks
    dac = sh_da[1, 1:1 + tz, 1:1 + ty].reshape(M, R)
    for tzz in range(3):
        for tyy in range(3):
            for txx in range(3):
                a = sh_x[txx, tzz:tzz + tz, tyy:tyy + ty].reshape(M, C)
                g = lax.dot_general(
                    a, dac,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # (C, R)
                idx = (tzz * 3 + tyy) * 3 + txx
                dw1_out[idx] = dw1_out[idx] + g
    dw2_out[:] = dw2_out[:] + lax.dot_general(
        hc[:], grc[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    db1_out[:] = db1_out[:] + jnp.sum(
        dac.astype(f32).reshape(M // 8, 8, R), axis=0
    )
    db2_out[:] = db2_out[:] + jnp.sum(
        grc[:].astype(f32).reshape(M // 8, 8, C), axis=0
    )


def _fused_backward(x, h, y, gy, w1, w2, *, interpret: bool):
    B, D, H, W, C = x.shape
    R = w1.shape[-1]
    tz, ty = _pick_tiles_bwd(D, H, W, C, R)

    Wp = -(-(W + 2) // 8) * 8
    padw = ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1), (0, 0))
    xp = jnp.pad(x, padw)
    gyp = jnp.pad(gy.astype(x.dtype), padw)
    yp = jnp.pad(y, padw)
    hp = jnp.pad(h, padw)
    w2t = jnp.transpose(w2).astype(x.dtype)              # (C, R)
    w1r = jnp.transpose(
        w1[::-1, ::-1, ::-1], (0, 1, 2, 4, 3)
    ).reshape(27, R, C).astype(x.dtype)

    kern = functools.partial(
        _res_bwd_kernel, tz=tz, ty=ty, W=W, Wp=Wp, C=C, R=R,
    )
    const = pl.BlockSpec  # alias for brevity below
    dx, dw1, dw2, db1p, db2p = pl.pallas_call(
        kern,
        grid=(B, D // tz, H // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            const((C, R), lambda b, z, y: (0, 0), memory_space=pltpu.VMEM),
            const((27, R, C), lambda b, z, y: (0, 0, 0),
                  memory_space=pltpu.VMEM),
        ],
        out_specs=[
            const((1, tz, ty, W, C), lambda b, z, y: (b, z, y, 0, 0),
                  memory_space=pltpu.VMEM),
            const((27, C, R), lambda b, z, y: (0, 0, 0),
                  memory_space=pltpu.VMEM),
            const((R, C), lambda b, z, y: (0, 0), memory_space=pltpu.VMEM),
            const((8, R), lambda b, z, y: (0, 0), memory_space=pltpu.VMEM),
            const((8, C), lambda b, z, y: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((27, C, R), jnp.float32),
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((8, R), jnp.float32),
            jax.ShapeDtypeStruct((8, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, tz + 2, ty + 2, W, R), x.dtype),
            pltpu.VMEM((3, tz + 2, ty + 2, W, C), x.dtype),
            pltpu.VMEM((tz * ty * W, C), x.dtype),
            pltpu.VMEM((tz * ty * W, R), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * H * W * C * R * 56,
            bytes_accessed=5 * B * D * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, gyp, yp, hp, w2t, w1r)
    return (
        dx,
        dw1.reshape(3, 3, 3, C, R),
        jnp.sum(db1p, axis=0),
        dw2,
        jnp.sum(db2p, axis=0),
    )


# ----------------------------------------------- GSPMD batch sharding
# the layer is embarrassingly parallel over batch; under a partitioned
# mesh each device runs its own kernel on the batch shard (GSPMD cannot
# see inside a pallas_call), weights replicated, and the backward's
# weight/bias grads are per-shard partials psum'd by the lowering
from synthanatomy_tpu.ops.partitioning import make_bh_partitioned


def _forward_impl(x, w1, b1, w2, b2, interpret):
    return _fused_forward(x, w1, b1, w2, b2, interpret=interpret)


def _forward_hidden_impl(x, w1, b1, w2, b2, interpret):
    y, h = _fused_forward(
        x, w1, b1, w2, b2, interpret=interpret, return_hidden=True
    )
    return y, h


def _backward_impl(x, h, y, gy, w1, w2, interpret):
    return _fused_backward(x, h, y, gy, w1, w2, interpret=interpret)


_forward_p = make_bh_partitioned(
    _forward_impl,
    n_operands=5,
    static_argnums=(5,),
    rule="b d h w c, i j k c r, r, r c, c -> b d h w c",
    replicated_argnums=(1, 2, 3, 4),
    n_lead=1,
)
_forward_hidden_p = make_bh_partitioned(
    _forward_hidden_impl,
    n_operands=5,
    static_argnums=(5,),
    rule="b d h w c, i j k c r, r, r c, c -> b d h w c, b d h w r",
    replicated_argnums=(1, 2, 3, 4),
    n_lead=1,
)
_backward_p = make_bh_partitioned(
    _backward_impl,
    n_operands=6,
    static_argnums=(6,),
    rule=(
        "b d h w c, b d h w r, b d h w c, b d h w c, i j k c r, r c"
        " -> b d h w c, i j k c r, r, r c, c"
    ),
    replicated_argnums=(4, 5),
    n_lead=1,
    summed_resnums=(1, 2, 3, 4),
)


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
    Pallas kernel; under differentiation the forward saves h via a
    second kernel output and the backward runs the fused backward
    kernel (XLA recompute-vjp fallback if no backward tile fits).
    Both directions go through batch-sharded custom_partitioning, so
    the layer stays fused under GSPMD DP meshes."""
    return _forward_p(x, w1, b1, w2, b2, interpret)


def _fwd(x, w1, b1, w2, b2, interpret):
    y, h = _forward_hidden_p(x, w1, b1, w2, b2, interpret)
    return y, (x, h, y, w1, b1, w2, b2)


def _bwd(interpret, res, gy):
    x, h, y, w1, b1, w2, b2 = res
    B, D, H, W, C = x.shape
    if _pick_tiles_bwd(D, H, W, C, w1.shape[-1]) is not None:
        return _backward_p(x, h, y, gy, w1, w2, interpret)
    _, vjp = jax.vjp(residual_layer_reference, x, w1, b1, w2, b2)
    return vjp(gy)


fused_residual_layer.defvjp(_fwd, _bwd)
