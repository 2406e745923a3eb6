"""Pallas flash-style kernels for banded local-window causal attention.

The hybrid Performer's local heads (the reference consumes CUDA kernels
from ``pytorch-fast-transformers`` / ``local-attention`` here, SURVEY.md
§2.9) are HBM-bound in the XLA path: each layer materializes the
(B, H, nb, w, 2w) fp32 score tensor (~540 MB at the paper shape
b6·16h·w420) through HBM three times (scores, mask+softmax, probs) at
elementwise bandwidth — measured 5.5 ms/layer forward.  These kernels
keep the score tile entirely in VMEM.

Layout (round 3): the sequence is split into blocks of ``s`` rows
(``s`` ≤ w, sublane-aligned); a query block attends its own block plus
``nl = ceil((w-1)/s)`` look-back blocks — the exact sliding-window set
``k_pos ∈ (q_pos - w, q_pos]``, same semantics as
``ops.local_attention.local_attention``.  Versus the round-2 layout
(one bucket of ``wp = pad(w)`` rows with look-backward-1, i.e. the
``s = wp, nl = 1`` special case), a narrower band cuts the dead score
area: at the paper shape (w=420, L=1401) the s=128 band computes
11·128·640 score cells vs 4·448·896 — 44% fewer MACs, mostly from
masked-out band corners and bucket padding.

- forward: one grid step = one (batch·head tile, query block); the
  (bt, s, (nl+1)s) score tile, mask, softmax and PV product never
  leave VMEM.  Look-back keys/values arrive via ``nl+1`` BlockSpec
  index maps ((t-off) mod nblk — pre-sequence partners are
  junk-but-masked), so no XLA-side gather/concat copies.
- backward: flash-style in-VMEM recompute — probabilities are rebuilt
  from the saved (post-rotary) q/k and the softmax/matmul backward runs
  in the same tile; dk/dv contributions to the look-back blocks are
  written as an ((nl+1)s, d) block per query block and folded with
  ``nl`` O(L·d) rolls outside.

The additive mask bias is precomputed on the host per look-back depth
(block variants 0..nl; blocks ≥ nl share one) and shipped as a kernel
input that stays VMEM-resident across the inner batch·head sweep.
Matmul operands stay in ``compute_dtype`` (bf16 under the training
policy → MXU rate, fp32 accumulation via ``preferred_element_type``);
softmax always fp32.

Numerics match ``ops.local_attention.local_attention`` (identical
allowed-key sets; fp32 summation order differs at fp32 tier); the
public entry :func:`local_attention_flash` falls back to the XLA path
off-TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

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


def _band_params(window: int, block_size: Optional[int]) -> Tuple[int, int]:
    """Query-block rows ``s`` and look-back depth ``nl`` for ``window``.

    Auto policy: blocks of 256 rows when the window is larger, else one
    sublane-aligned block per window (which reproduces the round-2
    ``s = pad(w), nl = 1`` layout for small windows).  Measured at the
    paper shape (w=420, b6·8h, L=1401, full train step): s=256 →
    115.9 ms/step vs s=128 → 128.1 vs the round-2 layout's 131.6; the
    kernel is grid/DMA-bound enough that the larger tile beats the
    lower-MAC s=128 band, and s∉{128,256} multiples (224, 512) blew
    Mosaic compile time past 10 min.  ``SYNTHANATOMY_LOCAL_BLOCK``
    overrides — bench ablation hook.
    """
    if block_size is None:
        env = os.environ.get("SYNTHANATOMY_LOCAL_BLOCK")
        if env:
            block_size = int(env)
        else:
            wp = _round_up(window, 32)
            block_size = 256 if wp > 256 else wp
    if block_size % 32:
        raise ValueError(f"block_size must be a multiple of 32, got {block_size}")
    nl = max(1, -(-(window - 1) // block_size))
    return block_size, nl


def _mask_bias(window: int, s: int, nl: int) -> "np.ndarray":
    """(nl+1, s, (nl+1)s) fp32 additive score bias, precomputed on the
    host: variant m = min(block_index, nl).  Column group g holds the
    keys of block ``t - (nl - g)`` (g = nl is the current block), at
    position ``rel = (g-nl)s + (c mod s)`` relative to the query block
    start; the band keeps ``rel ∈ (qoff - w, qoff]`` and variants
    m < nl additionally drop the pre-sequence look-back groups
    (g < nl - m), exactly the XLA path's mask semantics.  Shipping this
    as a kernel *input* (one block, re-used across the inner batch·head
    sweep) replaces ~15 per-step VPU iota/compare passes over the score
    tile with one DMA'd add."""
    import numpy as np

    span = (nl + 1) * s
    qoff = np.arange(s)[:, None]
    c = np.arange(span)[None, :]
    g = c // s
    rel = (g - nl) * s + (c % s)
    allowed = (rel <= qoff) & (rel > qoff - window)
    return np.stack(
        [
            np.where(allowed & (g >= nl - m), 0.0, _NEG)
            for m in range(nl + 1)
        ]
    ).astype(np.float32)


def _fwd_kernel(*refs, nl: int):
    """One grid step = (query block, bh-tile): blocks carry a leading
    ``bt`` batch·head tile so the per-grid-step fixed costs amortize
    over ``bt`` score tiles (batched MXU dims)."""
    q_ref = refs[0]
    k_refs = refs[1 : 2 + nl]
    v_refs = refs[2 + nl : 3 + 2 * nl]
    bias_ref = refs[3 + 2 * nl]
    o_ref = refs[4 + 2 * nl]
    cd = q_ref.dtype
    q = q_ref[:, 0]  # (bt, s, d)
    k2 = jnp.concatenate([r[:, 0] for r in k_refs], axis=1)  # (bt, span, d)
    v2 = jnp.concatenate([r[:, 0] for r in v_refs], axis=1)
    d = q_ref.shape[3]

    # VPU economy (probe_kernel_body.py, −7% body): fold the score
    # scale into q — one (bt, s, d) pass replaces a (bt, s, span) one —
    # and defer the softmax normalization past the PV matmul, dividing
    # the (bt, s, d) output instead of the (bt, s, span) prob tile.
    q = (q.astype(jnp.float32) * (d**-0.5)).astype(cd)
    scores = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0][None]  # (bt, s, span) fp32, masked

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = _EXP(scores - m)  # unnormalized, in [0, 1]
    o = jax.lax.dot_general(
        e.astype(cd), v2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = (o / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def _bwd_kernel(*refs, nl: int):
    q_ref = refs[0]
    k_refs = refs[1 : 2 + nl]
    v_refs = refs[2 + nl : 3 + 2 * nl]
    g_ref = refs[3 + 2 * nl]
    bias_ref = refs[4 + 2 * nl]
    dq_ref, dk2_ref, dv2_ref = refs[5 + 2 * nl :]
    cd = q_ref.dtype
    d = q_ref.shape[3]
    scale = d**-0.5
    q = q_ref[:, 0]  # (bt, s, d)
    k2 = jnp.concatenate([r[:, 0] for r in k_refs], axis=1)
    v2 = jnp.concatenate([r[:, 0] for r in v_refs], axis=1)
    g = g_ref[:, 0]

    scores = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0][None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = _EXP(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)  # (bt, s, span) fp32

    dP = jax.lax.dot_general(
        g, v2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bt, s, span)
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


def _bucketize(x, s: int):
    """(B, H, L, d) → (B·H, nblk, s, d), L padded to a multiple of s."""
    b, h, n, d = x.shape
    pad = (-n) % s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nblk = (n + pad) // s
    return x.reshape(b * h, nblk, s, d), nblk


def _bh_tile(bh: int, s: int, span: int, *, live_tiles: int) -> int:
    """Batch·head tile per grid step: amortizes the per-step fixed
    costs over several score tiles, bounded so ``live_tiles`` fp32
    (bt, s, span) tensors stay well inside VMEM (shared heuristic:
    ops/tiling.py)."""
    from synthanatomy_tpu.ops.tiling import vmem_bh_tile

    return vmem_bh_tile(bh, s * span, live=live_tiles)


def _block_specs(s: int, d: int, nblk: int, nl: int, bt: int):
    # grid is (nblk, bh//bt): the query-block index j is the OUTER grid
    # dim, so the (s, span) mask-bias block — which depends only on
    # min(j, nl) — stays resident across the whole inner bh sweep (its
    # DMA is skipped for unchanged block indices).  Look-back partner
    # g sits at block (j - (nl-g)) mod nblk; pre-sequence wraps deliver
    # junk that the bias variant masks.
    def kv(off: int):
        return pl.BlockSpec(
            (bt, 1, s, d),
            lambda j, i, off=off: (i, (j - off) % nblk, 0, 0),
            memory_space=pltpu.VMEM,
        )

    ks = [kv(nl - g) for g in range(nl + 1)]  # g ascending; ks[-1] = current
    bias = pl.BlockSpec(
        (1, s, (nl + 1) * s), lambda j, i: (jnp.minimum(j, nl), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return ks, bias


def _forward(q, k, v, bias, window: int, block_size, interpret: bool):
    """q,k,v: (B, H, L, d) post-rotary, compute dtype; bias the
    (nl+1, s, span) additive mask (an OPERAND, not a closure constant —
    custom_partitioning rejects jaxpr consts).  → (B, H, L, d)."""
    b, h, n, d = q.shape
    s, nl = _band_params(window, block_size)
    span = (nl + 1) * s
    qf, nblk = _bucketize(q, s)
    kf, _ = _bucketize(k, s)
    vf, _ = _bucketize(v, s)
    bh = b * h

    bt = _bh_tile(bh, s, span, live_tiles=2)
    ks, bspec = _block_specs(s, d, nblk, nl, bt)
    cur = ks[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nl=nl),
        grid=(nblk, bh // bt),
        in_specs=[cur] + ks + ks + [bspec],
        out_specs=cur,
        out_shape=jax.ShapeDtypeStruct((bh, nblk, s, d), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nblk * s * span * d,
            bytes_accessed=(3 + 2 * nl) * bh * nblk * s * d * q.dtype.itemsize,
            transcendentals=bh * nblk * s * span,
        ),
    )(qf, *([kf] * (nl + 1)), *([vf] * (nl + 1)), bias)

    return out.reshape(b, h, nblk * s, d)[:, :, :n]


def _backward(q, k, v, g, bias, window: int, block_size, interpret: bool):
    b, h, n, d = q.shape
    s, nl = _band_params(window, block_size)
    span = (nl + 1) * s
    qf, nblk = _bucketize(q, s)
    kf, _ = _bucketize(k, s)
    vf, _ = _bucketize(v, s)
    gf, _ = _bucketize(g.astype(q.dtype), s)
    bh = b * h

    bt = _bh_tile(bh, s, span, live_tiles=4)
    ks, bspec = _block_specs(s, d, nblk, nl, bt)
    cur = ks[-1]
    d2 = pl.BlockSpec(
        (bt, 1, span, d), lambda j, i: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk2, dv2 = pl.pallas_call(
        functools.partial(_bwd_kernel, nl=nl),
        grid=(nblk, bh // bt),
        in_specs=[cur] + ks + ks + [cur, bspec],
        out_specs=[cur, d2, d2],
        out_shape=[
            # gradients leave the kernel in compute dtype (probe: the
            # bwd body is output-write bound; bf16 outputs are −9% and
            # halve the fold's read traffic).  The public API returns
            # q.dtype/k.dtype gradients either way — only the rounding
            # point moves (per-contribution instead of post-fold).
            jax.ShapeDtypeStruct((bh, nblk, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nblk, span, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nblk, span, d), q.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * nblk * s * span * d,
            bytes_accessed=(6 + 2 * nl + 2 * (nl + 1))
            * bh * nblk * s * d * q.dtype.itemsize,
            transcendentals=bh * nblk * s * span,
        ),
    )(qf, *([kf] * (nl + 1)), *([vf] * (nl + 1)), gf, bias)

    def fold(dx2):
        # query block t's column group g carries gradients for block
        # t - (nl-g); pre-sequence wrap contributions are exactly zero
        # because those scores are masked (dS == 0).  Accumulate the
        # nl+1 contributions in fp32 regardless of the storage dtype.
        folded = dx2[:, :, nl * s :].astype(jnp.float32)
        for g_idx in range(nl):
            folded = folded + jnp.roll(
                dx2[:, :, g_idx * s : (g_idx + 1) * s], -(nl - g_idx), axis=1
            ).astype(jnp.float32)
        return folded.reshape(b, h, nblk * s, d)[:, :, :n]

    dqo = dq.reshape(b, h, nblk * s, d)[:, :, :n]
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
    static_argnums=(4, 5, 6),
    rule="b h l d, b h l d, b h l d, x u w -> b h l d",
    replicated_argnums=(3,),
)
_backward_p = make_bh_partitioned(
    _backward,
    n_operands=5,
    static_argnums=(5, 6, 7),
    rule=(
        "b h l d, b h l d, b h l d, b h l d, x u w -> "
        "b h l d, b h l d, b h l d"
    ),
    replicated_argnums=(4,),
)


def _bias_for(window: int, block_size):
    s, nl = _band_params(window, block_size)
    return jnp.asarray(_mask_bias(window, s, nl))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, window: int, block_size, interpret: bool):
    return _forward_p(q, k, v, _bias_for(window, block_size), window, block_size, interpret)


def _flash_fwd(q, k, v, window, block_size, interpret):
    out = _forward_p(q, k, v, _bias_for(window, block_size), window, block_size, interpret)
    return out, (q, k, v)


def _flash_bwd(window, block_size, interpret, res, g):
    q, k, v = res
    return _backward_p(
        q, k, v, g, _bias_for(window, block_size), window, block_size, interpret
    )


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
    block_size: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ``ops.local_attention.local_attention`` with Pallas
    forward+backward kernels on TPU (XLA fallback elsewhere /
    non-causal).  ``compute_dtype`` sets the matmul operand dtype
    (fp32 accumulation either way); ``block_size`` overrides the banded
    layout's query-block rows (default: auto, see ``_band_params``)."""
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
        q.astype(cd), k.astype(cd), v.astype(cd), window, block_size, interpret
    )
    return out.astype(in_dtype)
