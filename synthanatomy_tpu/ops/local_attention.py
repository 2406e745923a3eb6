"""Blocked local-window causal attention.

Rebuild of the windowed attention the reference's hybrid Performer
heads consume from the CUDA ``pytorch-fast-transformers`` /
``local-attention`` packages (reference performer.py:199-200,
docker/Dockerfile:20): each query attends causally to its own window
bucket and the previous one (look_backward=1), with optional rotary
relative position applied to q/k inside the head (the
``rel_pos_emb_config`` behaviour of the consumed package).

TPU-first shape: the sequence is padded to a multiple of ``window`` and
reshaped into (buckets, window); keys/values gather the previous bucket
via a roll — an O(L·w) dense attention that XLA fuses well (one matmul
of (w × 2w) per bucket).  A Pallas flash-style kernel can slot in here
later; the op-level contract stays identical.

``local_attention_step`` is the ring-buffer incremental form for
sampling: O(w) per step.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "local_attention",
    "local_attention_sequence_parallel",
    "local_attention_step",
    "rotary_sin_cos",
    "apply_rotary",
]


def rotary_sin_cos(dim: int, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sinusoidal (sin, cos) tables of shape (L, dim) for rotary
    application (GPT-NeoX-style duplicated frequencies)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.einsum("i,j->ij", positions.astype(jnp.float32), inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.sin(emb), jnp.cos(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """x: (..., L, d); sin/cos: (L, d) broadcast over leading dims."""
    return x * cos + _rotate_half(x) * sin


def local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    causal: bool = True,
    use_rotary: bool = True,
    position_offset: Union[int, jax.Array] = 0,
    halo_k: Optional[jax.Array] = None,
    halo_v: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """q,k,v: (B, H, L, d) → (B, H, L, d).

    ``position_offset`` shifts the absolute positions (rotary phases +
    causal/validity masks) — used by sequence-parallel shards.
    ``halo_k``/``halo_v`` (B, H, window, d) supply the previous
    ``window`` keys/values from the neighbouring shard (already
    rotary-rotated for their absolute positions) for bucket 0.

    ``compute_dtype=bfloat16`` runs the two O(L·w·d) matmuls with bf16
    operands (fp32 accumulation via ``preferred_element_type``); the
    rotary phases, masking and softmax stay fp32.  fp32 (default) is
    bit-identical to the original path.
    """
    b, h, n, d = q.shape
    in_dtype = v.dtype
    scale = d**-0.5

    if use_rotary:
        pos = jnp.arange(n) + position_offset
        sin, cos = rotary_sin_cos(d, pos)
        q = apply_rotary(q.astype(jnp.float32), sin, cos)
        k = apply_rotary(k.astype(jnp.float32), sin, cos)

    cd = compute_dtype
    q = q.astype(cd)
    k = k.astype(cd)
    v = v.astype(cd)
    pad = (-n) % window
    if pad:
        zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    n_pad = n + pad
    nb = n_pad // window

    qb = q.reshape(b, h, nb, window, d)
    kb = k.reshape(b, h, nb, window, d)
    vb = v.reshape(b, h, nb, window, d)

    # previous bucket (look_backward=1); bucket 0's "previous" is the
    # cross-shard halo when given, junk-but-masked otherwise
    k_prev = jnp.roll(kb, 1, axis=2)
    v_prev = jnp.roll(vb, 1, axis=2)
    if halo_k is not None:
        k_prev = k_prev.at[:, :, 0].set(halo_k.astype(k_prev.dtype))
        v_prev = v_prev.at[:, :, 0].set(halo_v.astype(v_prev.dtype))
    k2 = jnp.concatenate([k_prev, kb], axis=3)  # (b,h,nb,2w,d)
    v2 = jnp.concatenate([v_prev, vb], axis=3)

    scores = jnp.einsum(
        "bhnid,bhnjd->bhnij", qb, k2, preferred_element_type=jnp.float32
    ) * scale  # (b,h,nb,w,2w) fp32

    # mask: key absolute position must be ≤ query absolute position
    # (causal) and > query position - window (locality), and valid
    q_pos = jnp.arange(n_pad).reshape(nb, window) + position_offset  # (nb, w)
    k_pos = jnp.concatenate(
        [q_pos - window, q_pos], axis=-1
    )  # (nb, 2w) absolute positions of gathered keys
    valid = k_pos >= 0
    if causal:
        allowed = (k_pos[:, None, :] <= q_pos[:, :, None]) & (
            k_pos[:, None, :] > q_pos[:, :, None] - window
        )
    else:
        allowed = jnp.abs(k_pos[:, None, :] - q_pos[:, :, None]) < window
    mask = allowed & valid[:, None, :]  # (nb, w, 2w)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhnij,bhnjd->bhnid", probs.astype(cd), v2,
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(b, h, n_pad, d)[:, :, :n]
    return out.astype(in_dtype)


def local_attention_step(
    q_t: jax.Array,
    k_t: jax.Array,
    v_t: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    t: jax.Array,
    *,
    window: int,
    use_rotary: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Incremental step with a ring buffer of the last ``window`` keys.

    q_t/k_t/v_t: (B, H, d) at position ``t`` (int32 scalar);
    cache_k/cache_v: (B, H, window, d) ring buffers.  Returns
    (out_t, new_cache_k, new_cache_v).

    Window semantics match :func:`local_attention`: a query at absolute
    position t attends to positions (t-window, t] — itself plus the
    previous ``window-1`` tokens.
    """
    b, h, d = q_t.shape
    in_dtype = v_t.dtype
    scale = d**-0.5

    if use_rotary:
        posq = jnp.reshape(t, (1,))
        sin_q, cos_q = rotary_sin_cos(d, posq)
        q_t = apply_rotary(q_t.astype(jnp.float32)[..., None, :], sin_q, cos_q)[..., 0, :]
        k_t = apply_rotary(k_t.astype(jnp.float32)[..., None, :], sin_q, cos_q)[..., 0, :]

    # ring buffers keep their own dtype (bf16 halves the per-step cache
    # traffic that dominates local-head decode cost); score math in f32
    slot = jnp.mod(t, window)
    cache_k = jax.lax.dynamic_update_index_in_dim(
        cache_k, k_t.astype(cache_k.dtype), slot, axis=2
    )
    cache_v = jax.lax.dynamic_update_index_in_dim(
        cache_v, v_t.astype(cache_v.dtype), slot, axis=2
    )

    # absolute position of each ring slot given current write at `slot`
    slots = jnp.arange(window)
    # slots ≤ slot hold positions t - (slot - slots); slots > slot hold
    # t - (slot - slots) - window
    k_pos = t - (slot - slots) - jnp.where(slots > slot, window, 0)
    valid = (k_pos >= 0) & (k_pos > t - window) & (k_pos <= t)

    scores = (
        jnp.einsum(
            "bhd,bhjd->bhj", q_t.astype(jnp.float32), cache_k.astype(jnp.float32)
        )
        * scale
    )
    scores = jnp.where(valid[None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhj,bhjd->bhd", probs, cache_v.astype(jnp.float32))
    return out.astype(in_dtype), cache_k, cache_v


def local_attention_sequence_parallel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
    axis_name: str,
    use_rotary: bool = True,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Sequence-parallel blocked local attention — call under
    ``shard_map`` with q/k/v sharded along L over ``axis_name``.

    Context parallelism for the local heads needs only a *halo
    exchange* of the previous ``window`` keys/values between
    neighbouring shards over ICI (``ppermute``) — no ring attention
    (SURVEY.md §5.7).  Requires the per-shard length to be a multiple
    of ``window``.  Exact vs single-device :func:`local_attention`.
    """
    b, h, n_local, d = q.shape
    if n_local % window != 0:
        raise ValueError(
            f"sequence-parallel local attention needs shard length "
            f"({n_local}) divisible by window ({window})"
        )
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    offset = idx * n_local

    if use_rotary:
        pos = jnp.arange(n_local) + offset
        sin, cos = rotary_sin_cos(d, pos)
        q = apply_rotary(q.astype(jnp.float32), sin, cos)
        k = apply_rotary(k.astype(jnp.float32), sin, cos)

    # halo: my last `window` (rotated) keys/values → right neighbour
    halo_k = jax.lax.ppermute(
        k[:, :, -window:],
        axis_name,
        [(i, (i + 1) % n_shards) for i in range(n_shards)],
    )
    halo_v = jax.lax.ppermute(
        v[:, :, -window:].astype(jnp.float32),
        axis_name,
        [(i, (i + 1) % n_shards) for i in range(n_shards)],
    )
    # shard 0's incoming halo wraps around from the last shard; its
    # k_pos < 0 mask already rejects it, so no special-casing needed
    return local_attention(
        q, k, v,
        window=window,
        causal=True,
        use_rotary=False,
        position_offset=offset,
        halo_k=halo_k,
        halo_v=halo_v,
        compute_dtype=compute_dtype,
    )
