"""Weights-only int8 quantization for the decode hot path.

Incremental AR decoding is weight-streaming-bound: every generated
token re-reads every transformer matmul weight from HBM while the
matmuls themselves are (B≤16, K)×(K, N) GEMVs with negligible FLOPs.
Halving the weight bytes (bf16 → int8, symmetric per-output-channel
scales) halves the dominant traffic term.

Why a Pallas kernel and not plain XLA: inside the sampling
``lax.scan`` the weights are loop-invariant, so an XLA-level
``w_q.astype(bf16) * scale`` gets hoisted out of the loop and
materialised as a full bf16 copy in HBM — silently restoring the
original traffic.  The Pallas kernel streams the int8 block HBM→VMEM
and dequantises in-register, so int8 is what actually crosses the HBM
bus each step.  (This is the case SURVEY.md §2.9 reserves for custom
kernels: XLA's compilation model itself is what's insufficient.)

Replaces (performance path of) the reference's cuBLAS GEMMs consumed
via ``nn.Linear`` inside performer-pytorch (reference
src/networks/transformers/performer.py:194-219); the reference has no
quantized inference path at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_int8",
    "quantize_int4_packed",
    "int8_matmul",
    "int8_matmul_ref",
]


def quantize_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float weights → (w_q int8 (K, N), scale f32 (1, N)).

    Symmetric per-output-channel: ``w ≈ w_q * scale``.  Rounding is
    round-to-nearest-even (matches XLA's float→int conversion after
    ``jnp.rint``).
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, N)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.rint(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_int4_packed(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float weights → (packed int8 (K/2, N), scales f32 (2, N)).

    Two int4 values per byte, split along the CONTRACTION dim: byte k
    holds row ``k`` in the low nibble and row ``k + K/2`` in the high
    nibble, so the consumer unpacks into two contiguous (K/2, N) halves
    and runs ``x[:, :K/2] @ W_lo * s[0] + x[:, K/2:] @ W_hi * s[1]`` —
    no lane interleave (Mosaic-friendly) and a free per-half scale
    refinement over plain per-channel int4.  Symmetric, ±7 levels.

    Mosaic cannot load ``jnp.int4`` arrays (probed UNIMPLEMENTED on
    v5e — tools/probe_int4.py), hence the int8 carrier.
    """
    w = jnp.asarray(w, jnp.float32)
    k = w.shape[0]
    assert k % 2 == 0, k
    halves = w.reshape(2, k // 2, -1)  # [lo rows; hi rows]
    absmax = jnp.max(jnp.abs(halves), axis=1)  # (2, N)
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(
        jnp.rint(halves / scale[:, None, :]), -7, 7
    ).astype(jnp.int32)
    packed = ((q[1] & 15) << 4) | (q[0] & 15)
    return packed.astype(jnp.int8), scale


def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Packed (K/2, N) int8 → (lo, hi) int32 halves in [-8, 7] (the
    exact in-kernel unpack sequence; shared by the Pallas kernel body
    and the XLA reference path)."""
    p = packed.astype(jnp.int32)
    lo = ((p & 15) ^ 8) - 8
    hi = (((p >> 4) & 15) ^ 8) - 8
    return lo, hi


def int8_matmul_ref(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA reference path: x (R, K) × w_q (K, N) int8 → (R, N) f32.

    Used on CPU (tests) and as the numerical oracle for the kernel.
    NOTE: under a scan this path lets XLA hoist the dequantised bf16
    weights out of the loop — use :func:`int8_matmul` on TPU.
    """
    w = w_q.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
    return jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


def _kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(jnp.bfloat16)
    acc = jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    o_ref[...] = acc * s_ref[...]


@functools.partial(jax.jit, static_argnames=("block_n",))
def _int8_matmul_pallas(x, w_q, scale, *, block_n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, k = x.shape
    n = w_q.shape[1]
    grid = (n // block_n,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, block_n), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=k * n + 4 * (r * k + r * n + n),
            transcendentals=0,
        ),
    )(x, w_q, scale)


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    *,
    block_n: Optional[int] = None,
) -> jax.Array:
    """x (..., K) × w_q (K, N) int8, per-channel scale (1, N) → (..., N) f32.

    Streams int8 weight blocks HBM→VMEM and dequantises in-register
    (Pallas on TPU; XLA fallback elsewhere).  Leading dims of ``x`` are
    flattened; rows are padded to the f32 sublane multiple (8).
    """
    k, n = w_q.shape
    lead = x.shape[:-1]
    xf = jnp.asarray(x, jnp.float32).reshape(-1, k)
    r = xf.shape[0]

    if jax.default_backend() != "tpu":
        out = int8_matmul_ref(xf, w_q, scale)
        return out.reshape(*lead, n)

    if block_n is None:
        # largest 128-multiple divisor of n, capped at 512
        block_n = 512
        while n % block_n:
            block_n //= 2
        if block_n < 128:
            out = int8_matmul_ref(xf, w_q, scale)
            return out.reshape(*lead, n)

    pad_r = (-r) % 8
    if pad_r:
        xf = jnp.pad(xf, ((0, pad_r), (0, 0)))
    out = _int8_matmul_pallas(xf, w_q, scale, block_n=block_n)
    if pad_r:
        out = out[:r]
    return out.reshape(*lead, n)
