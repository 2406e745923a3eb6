"""Pallas flash-style kernel for blocked local-window causal attention.

Forward-pass kernel for the hybrid Performer's local heads (the
reference consumes CUDA kernels from ``pytorch-fast-transformers`` /
``local-attention`` here, SURVEY.md §2.9): one grid step processes one
(batch·head, bucket) pair — the (w × 2w) score tile, mask, softmax and
PV product all stay in VMEM, so the O(L·w) score/probability tensors
never touch HBM (the XLA path materializes them per layer, which is
what OOM'd the 24-layer training config before remat).

The op is wrapped in ``jax.custom_vjp``: backward recomputes
probabilities from the saved inputs (flash-attention style — O(L·w)
recompute instead of O(L·w) storage).

Numerics match ``ops.local_attention.local_attention`` (same bucketed
look-backward-1 semantics, rotary applied by the caller); the public
entry :func:`local_attention_flash` falls back to the XLA path off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synthanatomy_tpu.ops.local_attention import (
    apply_rotary,
    local_attention as _local_attention_xla,
    rotary_sin_cos,
)

__all__ = ["local_attention_flash"]


def _kernel(q_ref, k2_ref, v2_ref, o_ref):
    """Blocks: q (1,1,w,d); k2/v2 (1,1,2w,d); out (1,1,w,d).  Positions
    are derived from the bucket index (grid dim 1) with broadcasted
    iota — no tiny-lane position operands (Mosaic-hostile)."""
    q = q_ref[0, 0].astype(jnp.float32)  # (w, d)
    k2 = k2_ref[0, 0].astype(jnp.float32)  # (2w, d)
    v2 = v2_ref[0, 0].astype(jnp.float32)
    d = q.shape[-1]
    w = q.shape[0]

    scores = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5)  # (w, 2w)

    j = pl.program_id(1)  # bucket index
    base = j * w
    # within-bucket relative positions; absolute = base + rel
    q_rel = jax.lax.broadcasted_iota(jnp.int32, (w, 2 * w), 0)
    k_rel = jax.lax.broadcasted_iota(jnp.int32, (w, 2 * w), 1) - w
    # causal: k ≤ q; locality: k > q - w; validity: k absolute ≥ 0
    allowed = (k_rel <= q_rel) & (k_rel > q_rel - w) & (base + k_rel >= 0)
    scores = jnp.where(allowed, scores, jnp.float32(-1e30))

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        probs, v2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _forward(q, k, v, window: int, interpret: bool):
    """q,k,v: (B, H, L, d) post-rotary.  Returns (B, H, L, d)."""
    b, h, n, d = q.shape
    pad = (-n) % window
    if pad:
        zp = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zp), jnp.pad(k, zp), jnp.pad(v, zp)
    n_pad = n + pad
    nb = n_pad // window

    bh = b * h
    qf = q.reshape(bh, nb, window, d)
    kf = k.reshape(bh, nb, window, d)
    vf = v.reshape(bh, nb, window, d)
    k_prev = jnp.roll(kf, 1, axis=1)
    v_prev = jnp.roll(vf, 1, axis=1)
    k2 = jnp.concatenate([k_prev, kf], axis=2)  # (bh, nb, 2w, d)
    v2 = jnp.concatenate([v_prev, vf], axis=2)

    grid = (bh, nb)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, window, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * window, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * window, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, window, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nb, window, d), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nb * window * 2 * window * d * 2,
            bytes_accessed=bh * nb * window * d * 2 * 4,
            transcendentals=bh * nb * window * 2 * window,
        ),
    )(qf, k2, v2)

    out = out.reshape(b, h, n_pad, d)[:, :, :n]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, window: int, use_rotary: bool, interpret: bool):
    return _flash_fwd_impl(q, k, v, window, use_rotary, interpret)


def _flash_fwd_impl(q, k, v, window, use_rotary, interpret):
    if use_rotary:
        n = q.shape[2]
        sin, cos = rotary_sin_cos(q.shape[-1], jnp.arange(n))
        q = apply_rotary(q.astype(jnp.float32), sin, cos)
        k = apply_rotary(k.astype(jnp.float32), sin, cos)
    return _forward(
        q.astype(jnp.float32), k.astype(jnp.float32), v, window, interpret
    )


def _flash_fwd(q, k, v, window, use_rotary, interpret):
    out = _flash_fwd_impl(q, k, v, window, use_rotary, interpret)
    return out, (q, k, v)


def _flash_bwd(window, use_rotary, interpret, res, g):
    # flash-style: recompute the (cheap, local) attention in the
    # backward via jax.vjp of the XLA reference implementation — no
    # stored probabilities
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _local_attention_xla(
            q, k, v, window=window, causal=True, use_rotary=use_rotary
        ),
        q, k, v,
    )
    return vjp(g)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def local_attention_flash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    causal: bool = True,
    use_rotary: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ``ops.local_attention.local_attention`` with a
    Pallas forward on TPU (XLA fallback elsewhere / non-causal)."""
    if interpret is None:
        on_tpu = jax.default_backend() == "tpu"
        if not on_tpu:
            return _local_attention_xla(
                q, k, v, window=window, causal=causal, use_rotary=use_rotary
            )
        interpret = False
    if not causal:
        return _local_attention_xla(
            q, k, v, window=window, causal=False, use_rotary=use_rotary
        )
    return _flash_core(q, k, v, window, use_rotary, interpret)
