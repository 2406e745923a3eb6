"""3D convolution primitives with PyTorch parameter semantics, lowered
to XLA ``conv_general_dilated`` in channels-last (NDHWC) layout — the
TPU-native layout where the channel dim rides the 128-lane axis and XLA
tiles the contraction onto the MXU.

The reference uses cuDNN ``nn.Conv3d`` / ``nn.ConvTranspose3d`` with
``(kernel, stride, padding, dilation[, output_padding])`` tuples
(reference src/networks/vqvae/baseline.py:218-299); these helpers keep
those exact shape semantics so configs and converted checkpoints map
1:1:

  conv:            out = floor((in + 2p - d(k-1) - 1)/s) + 1
  conv_transpose:  out = (in - 1)s - 2p + d(k-1) + 1 + op
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv3d", "conv_transpose3d", "subpixel_upsample3d"]

_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)

# measured on v5e: XLA already phase-optimizes the input-dilated conv
# (the explicit decomposition was ~10% slower at 160×224×160), so the
# exact fast path stays available but off; flip for hardware where the
# dilated lowering is poor.
PHASE_DECOMP_TRANSPOSED_CONV = False


def _triple(v: Union[int, Sequence[int]]) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t


# Cin threshold for the thin-input space-to-depth path (OFF by
# default, measured): re-blocking 2×2×2 input cells into channels
# turns a Cin=1 k4s2 conv into a dense k2 conv with an 8·Cin-channel
# input.  Isolated-op timings suggested the stock lowering was ~30×
# off ideal, but those were dominated by the tunnel's ~3 ms dispatch
# floor (CLAUDE.md); at the MODEL level the path measured NO win
# (extract+decode 51.4 vs 48.8 ms/vol, inside variance — BASELINE.md
# round 4), so the simple lowering stays.  Unlike the Cout=1
# transposed conv above, XLA handles thin INPUTS acceptably (taps go
# into the contraction dimension on its own).
THIN_CONV_MAX_CI = 0


def _conv_s2k4p1_thin_input(x, kernel, bias):
    """k4/s2/p1 conv for THIN input channels (Cin ≤ 2) via
    space-to-depth: pad so taps align to 2³ cells, fold each cell's
    2×2×2 phases into channels, then one dense k2/s1 VALID conv.

    Derivation (per axis): out[u] = Σ_t x[2u + t − 1]·w[t]
    = Σ_t xpad[2u + t]·w[t] with xpad = pad(x, (1, 2)).  Writing
    t = 2a + φ (cell offset a ∈ {0,1}, phase φ ∈ {0,1}): the tap lives
    in cell u + a at phase φ, so after space-to-depth the kernel
    regroups as w2[a][φ·Cin + c] = w[2a + φ][c]."""
    n, d1, d2, d3, ci = x.shape
    co = kernel.shape[-1]
    # pad 1 at the front (the p=1 halo); pad the back so the padded
    # length is even (2-cell tiling) and covers the last window
    pr = [3 - (d % 2) for d in (d1, d2, d3)]
    xpad = jnp.pad(
        x, ((0, 0), (1, pr[0]), (1, pr[1]), (1, pr[2]), (0, 0))
    )
    c1, c2, c3 = [(d + 1 + p_) // 2 for d, p_ in zip((d1, d2, d3), pr)]
    xs = xpad.reshape(n, c1, 2, c2, 2, c3, 2, ci)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xs = xs.reshape(n, c1, c2, c3, 8 * ci)  # phase-major (φ1,φ2,φ3,ci)

    # kernel (4,4,4,Ci,Co) → (2,2,2, 8·Ci, Co): phase-parity slices of
    # the taps, concatenated phase-major to match xs's channel order
    k2 = jnp.concatenate(
        [
            kernel[f1::2, f2::2, f3::2]
            for f1 in (0, 1)
            for f2 in (0, 1)
            for f3 in (0, 1)
        ],
        axis=3,
    )  # (2,2,2, 8·Ci, Co), tap index a on the spatial dims
    out = lax.conv_general_dilated(
        xs,
        k2.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_DN,
    )
    # VALID k2 over the cell grid gives (c-1) positions; crop to the
    # torch output size floor((d + 2p − k)/s) + 1 = floor((d−2)/2) + 1
    oshape = tuple((d - 2) // 2 + 1 for d in (d1, d2, d3))
    out = out[:, : oshape[0], : oshape[1], : oshape[2]]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    dilation: Union[int, Sequence[int]] = 1,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """x: (N, D, H, W, Cin); kernel: (kD, kH, kW, Cin, Cout)."""
    s, p, d = _triple(stride), _triple(padding), _triple(dilation)
    if (
        kernel.shape[3] <= THIN_CONV_MAX_CI
        and kernel.shape[:3] == (4, 4, 4)
        and s == (2, 2, 2)
        and p == (1, 1, 1)
        and d == (1, 1, 1)
    ):
        return _conv_s2k4p1_thin_input(x, kernel.astype(x.dtype), bias)
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=s,
        padding=[(pi, pi) for pi in p],
        rhs_dilation=d,
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_transpose_s2k4p1(x, kernel, bias):
    """Exact phase decomposition of ConvTranspose3d(k=4, s=2, p=1):
    one dense 2×2×2 conv producing all 8 output phases + a
    depth-to-space interleave.

    The generic path lowers to an input-dilated conv whose zeros waste
    7/8 of the MXU work (SURVEY.md §7 'transposed-conv performance');
    this path does the theoretical-minimum MACs.  Derivation: with
    W' = flip(W), output parity r per axis selects taps W'[2a + r]
    over the input window starting at u - 1 + r.
    """
    n, d1, d2, d3, ci = x.shape
    co = kernel.shape[-1]
    wf = jnp.flip(kernel, axis=(0, 1, 2))  # (4,4,4,Ci,Co)

    # phase kernels: K[r1,r2,r3][a,b,c] = W'[2a+r1, 2b+r2, 2c+r3]
    # build (2,2,2, Ci, Co*8) with phase index p = r1*4 + r2*2 + r3
    phases = []
    for r1 in (0, 1):
        for r2 in (0, 1):
            for r3 in (0, 1):
                phases.append(wf[r1::2, r2::2, r3::2])  # (2,2,2,Ci,Co)
    k_all = jnp.concatenate(phases, axis=-1)  # (2,2,2,Ci,8Co)

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xpad,
        k_all.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_DN,
    )  # (N, d1+1, d2+1, d3+1, 8Co)

    # per-phase shifted windows → interleave (depth-to-space)
    parts = []
    idx = 0
    for r1 in (0, 1):
        for r2 in (0, 1):
            for r3 in (0, 1):
                parts.append(
                    y[:, r1 : d1 + r1, r2 : d2 + r2, r3 : d3 + r3,
                      idx * co : (idx + 1) * co]
                )
                idx += 1
    z = jnp.stack(parts, axis=4)  # (N, d1, d2, d3, 8, Co)
    z = z.reshape(n, d1, d2, d3, 2, 2, 2, co)
    z = z.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    out = z.reshape(n, 2 * d1, 2 * d2, 2 * d3, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_transpose_s2k4p1_thin(x, kernel, bias):
    """k4/s2/p1 transposed conv for THIN output channels (Co ≤ 8) as a
    taps×phases-packed matmul.

    XLA's dilated-conv lowering of a Co=1 transposed conv cannot tile
    the MXU lane dimension (1 output column) and measures ~0.1 TFLOP/s
    on v5e — the paper decoder's final 128→1 layer alone was 84% of the
    whole decode program (BASELINE.md round 4).  Packing the 2³ input
    taps × 2³ output phases × Co into the matmul's column dimension
    gives 64·Co columns at the SAME total MAC count (every G element
    below is consumed exactly once), then 8 shifted slice-adds per
    phase combine the taps (streaming VPU work) and a depth-to-space
    interleave lays out the output.

    Derivation (per axis, W' = flip(W)):
      out[2u + r] = Σ_{a∈{0,1}} xpad[u + r + a] · W'[2a + r]
    with xpad zero-padded by 1 — the same identity as
    ``_conv_transpose_s2k4p1`` above, with the (a, r) pair moved from
    conv taps into matmul columns.
    """
    n, d1, d2, d3, ci = x.shape
    co = kernel.shape[-1]
    wf = jnp.flip(kernel, axis=(0, 1, 2))  # (4,4,4,Ci,Co)

    cols = []
    for a1 in (0, 1):
        for a2 in (0, 1):
            for a3 in (0, 1):
                for r1 in (0, 1):
                    for r2 in (0, 1):
                        for r3 in (0, 1):
                            cols.append(
                                wf[2 * a1 + r1, 2 * a2 + r2, 2 * a3 + r3]
                            )  # (Ci, Co)
    w2 = jnp.concatenate(cols, axis=-1)  # (Ci, 64·Co)

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    g = xpad @ w2  # (n, d1+2, d2+2, d3+2, 64·Co)

    parts = []
    for r1 in (0, 1):
        for r2 in (0, 1):
            for r3 in (0, 1):
                acc = None
                for a1 in (0, 1):
                    for a2 in (0, 1):
                        for a3 in (0, 1):
                            a_idx = (a1 * 2 + a2) * 2 + a3
                            r_idx = (r1 * 2 + r2) * 2 + r3
                            c0 = (a_idx * 8 + r_idx) * co
                            sl = g[
                                :,
                                r1 + a1 : r1 + a1 + d1,
                                r2 + a2 : r2 + a2 + d2,
                                r3 + a3 : r3 + a3 + d3,
                                c0 : c0 + co,
                            ]
                            acc = sl if acc is None else acc + sl
                parts.append(acc)
    z = jnp.stack(parts, axis=4)  # (n, d1, d2, d3, 8, Co), p = r1r2r3
    z = z.reshape(n, d1, d2, d3, 2, 2, 2, co)
    z = z.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    out = z.reshape(n, 2 * d1, 2 * d2, 2 * d3, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# Co threshold for the thin-output matmul path: at Co·64 ≤ 512 columns
# the packed matmul stays one-to-few lane tiles and G's HBM footprint
# is modest; at large Co the standard dilated-conv lowering tiles the
# MXU fine on its own (and G would blow up HBM traffic 8×).
THIN_CONV_TRANSPOSE_MAX_CO = 8


def conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    output_padding: Union[int, Sequence[int]] = 0,
    dilation: Union[int, Sequence[int]] = 1,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Transposed conv with torch ``ConvTranspose3d`` shape semantics.

    x: (N, D, H, W, Cin); kernel: (kD, kH, kW, Cin, Cout) — stored in
    the *forward* orientation of this op (flipped + input-dilated conv
    under the hood, the standard fractionally-strided-conv identity).
    The ubiquitous (k=4, s=2, p=1) case takes the exact
    phase-decomposition fast path (see above).
    """
    s, p, d = _triple(stride), _triple(padding), _triple(dilation)
    op = _triple(output_padding)
    k = kernel.shape[:3]

    k4s2p1 = (
        k == (4, 4, 4)
        and s == (2, 2, 2)
        and p == (1, 1, 1)
        and op == (0, 0, 0)
        and d == (1, 1, 1)
    )
    if k4s2p1 and kernel.shape[-1] <= THIN_CONV_TRANSPOSE_MAX_CO:
        return _conv_transpose_s2k4p1_thin(x, kernel.astype(x.dtype), bias)
    if PHASE_DECOMP_TRANSPOSED_CONV and k4s2p1:
        return _conv_transpose_s2k4p1(x, kernel.astype(x.dtype), bias)
    # torch: out = (in-1)s - 2p + d(k-1) + 1 + op
    pads = []
    for ki, si, pi, di, opi in zip(k, s, p, d, op):
        lo = di * (ki - 1) - pi
        pads.append((lo, lo + opi))
    out = lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=(0, 1, 2)).astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=s,
        rhs_dilation=d,
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def subpixel_upsample3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    *,
    scale: int,
) -> jax.Array:
    """Sub-pixel (pixel-shuffle) upsampling: 3×3×3 conv to
    ``out_ch·scale³`` channels followed by a 3D depth-to-space rearrange
    (the MONAI ``SubpixelUpsample`` path selected by
    ``use_subpixel_conv``, reference baseline.py:273-287).

    kernel: (3, 3, 3, Cin, Cout·scale³).
    """
    n, dd, hh, ww, _ = x.shape
    cout_r3 = kernel.shape[-1]
    r = scale
    cout = cout_r3 // (r**3)
    h = conv3d(x, kernel, stride=1, padding=1, bias=bias)
    h = h.reshape(n, dd, hh, ww, r, r, r, cout)
    h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # N, D,r, H,r, W,r, C
    return h.reshape(n, dd * r, hh * r, ww * r, cout)
