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

    if (
        PHASE_DECOMP_TRANSPOSED_CONV
        and k == (4, 4, 4)
        and s == (2, 2, 2)
        and p == (1, 1, 1)
        and op == (0, 0, 0)
        and d == (1, 1, 1)
    ):
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
