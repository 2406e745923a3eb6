"""Pallas flash-style kernels for blocked local-window causal attention.

The hybrid Performer's local heads (the reference consumes CUDA kernels
from ``pytorch-fast-transformers`` / ``local-attention`` here, SURVEY.md
§2.9) are HBM-bound in the XLA path: each layer materializes the
(B, H, nb, w, 2w) fp32 score tensor (~540 MB at the paper shape
b6·16h·w420) through HBM three times (scores, mask+softmax, probs) at
elementwise bandwidth — measured 5.5 ms/layer forward.  These kernels
keep the score tile entirely in VMEM:

- forward: one grid step = one (batch·head, bucket) pair; the
  (wp × 2wp) score tile, mask, softmax and PV product never leave VMEM.
  The previous bucket's keys/values arrive via the BlockSpec index map
  ((j-1) mod nb — bucket 0's wrap partner is junk-but-masked), so the
  XLA-side k2/v2 concat copies disappear too.
- backward: flash-style in-VMEM recompute — probabilities are rebuilt
  from the saved (post-rotary) q/k and the softmax/matmul backward runs
  in the same tile; dk/dv contributions to the previous bucket are
  written as a separate (2wp, d) block and folded with one O(L·d) roll
  outside.

Buckets are padded from ``w`` to a sublane-aligned ``wp`` (multiple of
32); the mask handles the padded rows.  Matmul operands stay in
``compute_dtype`` (bf16 under the training policy → MXU rate, fp32
accumulation via ``preferred_element_type``); softmax always fp32.

Numerics match ``ops.local_attention.local_attention`` (same bucketed
look-backward-1 semantics, rotary applied by the caller); the public
entry :func:`local_attention_flash` falls back to the XLA path off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from synthanatomy_tpu.ops.local_attention import (
    apply_rotary,
    local_attention as _local_attention_xla,
    rotary_sin_cos,
)

__all__ = ["local_attention_flash"]

_NEG = -1e30

# timing probe hook: swap the softmax exp implementation
_EXP = jnp.exp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mask_bias(w: int, wp: int) -> "np.ndarray":
    """(2, wp, 2wp) fp32 additive score bias, precomputed on the host:
    row 0 = bucket 0 (absolute validity drops the wrapped 'previous'
    bucket), row 1 = every later bucket.  Columns [0, wp) are the
    previous bucket (rel positions c-w for c<w), columns [wp, 2wp) the
    current (rel c-wp).  Causal + locality + validity, exactly the XLA
    path's semantics.  Shipping this as a kernel *input* (one block,
    re-used across grid steps) replaces ~15 per-step VPU iota/compare
    passes over the (wp, 2wp) tile — the dominant kernel cost at the
    paper shape — with one DMA'd add."""
    import numpy as np

    q_rel = np.arange(wp)[:, None]
    c = np.arange(2 * wp)[None, :]
    is_prev = c < wp
    rel = np.where(is_prev, c - w, c - wp)
    key_valid = (c < w) | ((c >= wp) & (c < wp + w))
    q_valid = q_rel < w
    allowed = key_valid & q_valid & (rel <= q_rel) & (rel > q_rel - w)
    bias = np.stack([
        np.where(allowed & (rel >= 0), 0.0, _NEG),  # bucket 0: base == 0
        np.where(allowed, 0.0, _NEG),  # base ≥ w ⇒ base + rel ≥ 0 always
    ]).astype(np.float32)
    return bias


def _fwd_kernel(q_ref, kp_ref, kc_ref, vp_ref, vc_ref, bias_ref, o_ref, *, w: int):
    """One grid step = (bh-tile, bucket): blocks carry a leading
    ``bt`` batch·head tile so the per-grid-step fixed costs amortize
    over ``bt`` score tiles (batched MXU dims)."""
    d = q_ref.shape[3]
    cd = q_ref.dtype
    q = q_ref[:, 0]  # (bt, wp, d)
    k2 = jnp.concatenate([kp_ref[:, 0], kc_ref[:, 0]], axis=1)  # (bt, 2wp, d)
    v2 = jnp.concatenate([vp_ref[:, 0], vc_ref[:, 0]], axis=1)

    scores = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5) + bias_ref[0][None]  # (bt, wp, 2wp) fp32, masked

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = _EXP(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:, 0] = jax.lax.dot_general(
        probs.astype(cd), v2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, kp_ref, kc_ref, vp_ref, vc_ref, g_ref, bias_ref,
    dq_ref, dk2_ref, dv2_ref, *, w: int,
):
    d = q_ref.shape[3]
    cd = q_ref.dtype
    scale = d**-0.5
    q = q_ref[:, 0]  # (bt, wp, d)
    k2 = jnp.concatenate([kp_ref[:, 0], kc_ref[:, 0]], axis=1)
    v2 = jnp.concatenate([vp_ref[:, 0], vc_ref[:, 0]], axis=1)
    g = g_ref[:, 0]

    scores = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0][None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = _EXP(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)  # (bt, wp, 2wp) fp32

    dP = jax.lax.dot_general(
        g, v2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bt, wp, 2wp)
    t = jnp.sum(dP * probs, axis=-1, keepdims=True)
    dS = probs * (dP - t)  # masked entries have probs == 0 → dS == 0

    dq_ref[:, 0] = (
        jax.lax.dot_general(
            dS.astype(cd), k2,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dq_ref.dtype)
    dk2_ref[:, 0] = (
        jax.lax.dot_general(
            dS.astype(cd), q,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk2_ref.dtype)
    dv2_ref[:, 0] = jax.lax.dot_general(
        probs.astype(cd), g,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv2_ref.dtype)


def _bucketize(x, window: int, wp: int):
    """(B, H, L, d) → (B·H, nb, wp, d) with per-bucket row padding."""
    b, h, n, d = x.shape
    pad = (-n) % window
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nb = (n + pad) // window
    x = x.reshape(b * h, nb, window, d)
    if wp != window:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - window), (0, 0)))
    return x, nb


def _bh_tile(bh: int, wp: int, *, live_tiles: int) -> int:
    """Batch·head tile per grid step: amortizes the per-step fixed
    costs over several score tiles, bounded so ``live_tiles`` fp32
    (bt, wp, 2wp) tensors stay well inside VMEM (~16 MB/core)."""
    budget = 10 * 1024 * 1024
    bt = 4
    while bt > 1 and (
        bh % bt != 0 or live_tiles * bt * wp * 2 * wp * 4 > budget
    ):
        bt -= 1
    return bt


def _block_specs(wp: int, d: int, nb: int, bt: int):
    # grid is (nb, bh//bt): the bucket index j is the OUTER grid dim, so
    # the (wp, 2wp) mask-bias block — which depends only on min(j, 1) —
    # stays resident across the whole inner bh sweep (its DMA is
    # skipped for unchanged block indices): 2 bias fetches per kernel
    # instead of one per grid step.
    cur = pl.BlockSpec(
        (bt, 1, wp, d), lambda j, i: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    prev = pl.BlockSpec(
        (bt, 1, wp, d), lambda j, i: (i, (j - 1) % nb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias = pl.BlockSpec(
        (1, wp, 2 * wp), lambda j, i: (jnp.minimum(j, 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return cur, prev, bias


def _forward(q, k, v, bias, window: int, interpret: bool):
    """q,k,v: (B, H, L, d) post-rotary, compute dtype; bias the
    (2, wp, 2wp) additive mask (an OPERAND, not a closure constant —
    custom_partitioning rejects jaxpr consts).  → (B, H, L, d)."""
    b, h, n, d = q.shape
    wp = _round_up(window, 32)
    qf, nb = _bucketize(q, window, wp)
    kf, _ = _bucketize(k, window, wp)
    vf, _ = _bucketize(v, window, wp)
    bh = b * h

    bt = _bh_tile(bh, wp, live_tiles=2)
    cur, prev, bspec = _block_specs(wp, d, nb, bt)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w=window),
        grid=(nb, bh // bt),
        in_specs=[cur, prev, cur, prev, cur, bspec],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((bh, nb, wp, d), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nb * wp * 2 * wp * d * 2,
            bytes_accessed=5 * bh * nb * wp * d * q.dtype.itemsize,
            transcendentals=bh * nb * wp * 2 * wp,
        ),
    )(qf, kf, kf, vf, vf, bias)

    out = out[:, :, :window].reshape(b, h, nb * window, d)[:, :, :n]
    return out


def _backward(q, k, v, g, bias, window: int, interpret: bool):
    b, h, n, d = q.shape
    wp = _round_up(window, 32)
    qf, nb = _bucketize(q, window, wp)
    kf, _ = _bucketize(k, window, wp)
    vf, _ = _bucketize(v, window, wp)
    gf, _ = _bucketize(g.astype(q.dtype), window, wp)
    bh = b * h

    bt = _bh_tile(bh, wp, live_tiles=4)
    cur, prev, bspec = _block_specs(wp, d, nb, bt)
    d2 = pl.BlockSpec(
        (bt, 1, 2 * wp, d), lambda j, i: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk2, dv2 = pl.pallas_call(
        functools.partial(_bwd_kernel, w=window),
        grid=(nb, bh // bt),
        in_specs=[cur, prev, cur, prev, cur, cur, bspec],
        out_specs=[cur, d2, d2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nb, wp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nb, 2 * wp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nb, 2 * wp, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * nb * wp * 2 * wp * d,
            bytes_accessed=11 * bh * nb * wp * d * 4,
            transcendentals=bh * nb * wp * 2 * wp,
        ),
    )(qf, kf, kf, vf, vf, gf, bias)

    def fold(dx2):
        # bucket j's columns [0, wp) are gradients for bucket (j-1)'s
        # keys/values; bucket 0's wrap contribution to bucket nb-1 is
        # exactly zero because those scores are masked
        prev_part = dx2[:, :, :window]
        cur_part = dx2[:, :, wp : wp + window]
        folded = cur_part + jnp.roll(prev_part, -1, axis=1)
        return folded.reshape(b, h, nb * window, d)[:, :, :n]

    dqo = dq[:, :, :window].reshape(b, h, nb * window, d)[:, :, :n]
    return dqo.astype(q.dtype), fold(dk2).astype(k.dtype), fold(dv2).astype(v.dtype)


# GSPMD-partitionable wrappers: the kernels are independent per
# (batch, head) slice, so meshes may shard those dims freely (DP batch
# sharding, Megatron TP head sharding, DP×TP) — each device lowers to
# its own pallas_call on the shard; sequence/feature dims are forced
# replicated (see ops/partitioning.py)
from synthanatomy_tpu.ops.partitioning import make_bh_partitioned

_forward_p = make_bh_partitioned(
    _forward,
    n_operands=4,
    static_argnums=(4, 5),
    rule="b h l d, b h l d, b h l d, x u w -> b h l d",
    replicated_argnums=(3,),
)
_backward_p = make_bh_partitioned(
    _backward,
    n_operands=5,
    static_argnums=(5, 6),
    rule=(
        "b h l d, b h l d, b h l d, b h l d, x u w -> "
        "b h l d, b h l d, b h l d"
    ),
    replicated_argnums=(4,),
)


def _bias_for(window: int):
    wp = _round_up(window, 32)
    return jnp.asarray(_mask_bias(window, wp))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_core(q, k, v, window: int, interpret: bool):
    return _forward_p(q, k, v, _bias_for(window), window, interpret)


def _flash_fwd(q, k, v, window, interpret):
    out = _forward_p(q, k, v, _bias_for(window), window, interpret)
    return out, (q, k, v)


def _flash_bwd(window, interpret, res, g):
    q, k, v = res
    return _backward_p(q, k, v, g, _bias_for(window), window, interpret)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def local_attention_flash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    causal: bool = True,
    use_rotary: bool = True,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ``ops.local_attention.local_attention`` with Pallas
    forward+backward kernels on TPU (XLA fallback elsewhere /
    non-causal).  ``compute_dtype`` sets the matmul operand dtype
    (fp32 accumulation either way)."""
    if interpret is None:
        # honour `with jax.default_device(cpu)` (host-side model init):
        # the pallas_call must not be staged for a CPU execution
        dd = jax.config.jax_default_device
        on_tpu = (
            dd.platform == "tpu"
            if dd is not None
            else jax.default_backend() == "tpu"
        )
        if not on_tpu:
            return _local_attention_xla(
                q, k, v, window=window, causal=causal, use_rotary=use_rotary,
                compute_dtype=compute_dtype,
            )
        interpret = False
    if not causal:
        return _local_attention_xla(
            q, k, v, window=window, causal=False, use_rotary=use_rotary,
            compute_dtype=compute_dtype,
        )
    in_dtype = v.dtype
    if use_rotary:
        n = q.shape[2]
        sin, cos = rotary_sin_cos(q.shape[-1], jnp.arange(n))
        q = apply_rotary(q.astype(jnp.float32), sin, cos)
        k = apply_rotary(k.astype(jnp.float32), sin, cos)
    cd = compute_dtype
    out = _flash_core(
        q.astype(cd), k.astype(cd), v.astype(cd), window, interpret
    )
    return out.astype(in_dtype)
