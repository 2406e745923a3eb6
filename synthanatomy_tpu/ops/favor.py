"""FAVOR+ linear attention (Performer), TPU-native.

First-party JAX rebuild of the random-feature attention the reference
consumes from ``performer-pytorch`` (pinned 1.0.11; reference
src/networks/transformers/performer.py:194-219 passes through
``nb_features``, ``generalized_attention``, ``feature_redraw_interval``
etc.).  Faithful math:

- orthogonal random features via blockwise QR of Gaussians with
  chi-distributed row norms (``gaussian_orthogonal_random_matrix``,
  scaling=0),
- the softmax kernel estimator  φ(x) = m^{-1/2}·exp(xᵀw·d^{-1/4}
  − ‖x‖²·d^{-1/2}/2 − max(...)) + ε  with the query/key max-stabilizer
  asymmetry of the original implementation,
- optional generalized attention with an arbitrary elementwise
  ``kernel_fn`` (default ReLU),
- non-causal: two einsums;  causal: **chunked prefix scan** over the
  sequence — the running (K·Vᵀ, ΣK) state is O(m·d) per head, carried
  by ``lax.scan`` across chunks with a within-chunk triangular mask.
  This replaces the reference's CUDA ``fast_transformers`` path and is
  the shardable form: the scan state psums/shifts cleanly over an ICI
  sequence axis (SURVEY.md §5.7).

All feature/attention math in fp32 (bf16-safe), inputs may be bf16.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_orthogonal_random_matrix",
    "softmax_kernel_features",
    "generalized_kernel_features",
    "favor_attention",
    "favor_attention_step",
    "default_nb_features",
]


def default_nb_features(dim_head: int) -> int:
    """The consumed implementation defaults to
    ``int(dim_head · ln(dim_head))`` (266 for d=64); we round to the
    nearest multiple of 128 (TPU lane width) so the feature dim tiles
    the MXU/VPU exactly — 256 for d=64, a negligible estimator change."""
    raw = int(dim_head * math.log(dim_head))
    return max(128, round(raw / 128) * 128)


def gaussian_orthogonal_random_matrix(
    key: jax.Array, nb_rows: int, nb_cols: int, scaling: int = 0
) -> jax.Array:
    """(nb_rows, nb_cols) random matrix with orthogonal row blocks.

    scaling=0: rows rescaled by chi-distributed norms of fresh
    Gaussians (the FAVOR+ default); scaling=1: rows scaled by √d.
    """
    nb_full_blocks = nb_rows // nb_cols
    keys = jax.random.split(key, nb_full_blocks + 2)
    blocks = []
    for i in range(nb_full_blocks):
        g = jax.random.normal(keys[i], (nb_cols, nb_cols), jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    rem = nb_rows - nb_full_blocks * nb_cols
    if rem > 0:
        g = jax.random.normal(keys[nb_full_blocks], (nb_cols, nb_cols), jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:rem])
    mat = jnp.concatenate(blocks, axis=0)

    if scaling == 0:
        multiplier = jnp.linalg.norm(
            jax.random.normal(keys[-1], (nb_rows, nb_cols), jnp.float32), axis=1
        )
    elif scaling == 1:
        multiplier = jnp.full((nb_rows,), float(np.sqrt(nb_cols)), jnp.float32)
    else:
        raise ValueError(f"invalid scaling {scaling}")
    return multiplier[:, None] * mat


def softmax_kernel_features(
    data: jax.Array,
    projection: jax.Array,
    *,
    is_query: bool,
    eps: float = 1e-4,
    stabilizer: Optional[jax.Array] = None,
) -> jax.Array:
    """data: (..., L, d) → features (..., L, m); fp32.

    ``stabilizer`` overrides the max-subtraction constant.  For keys the
    stabilizer must be *uniform across positions* (it then cancels in
    the attention ratio); incremental decoding passes an explicit 0 so
    step features match batch features up to that global constant.
    """
    data = jnp.asarray(data, jnp.float32)
    d = data.shape[-1]
    m = projection.shape[0]
    data_normalizer = d**-0.25
    ratio = m**-0.5

    data_dash = jnp.einsum(
        "...id,jd->...ij", data_normalizer * data, projection
    )  # (..., L, m)
    diag_data = jnp.sum(jnp.square(data), axis=-1) / 2.0 * (data_normalizer**2)
    diag_data = diag_data[..., None]

    if stabilizer is None:
        if is_query:
            stabilizer = jnp.max(data_dash, axis=-1, keepdims=True)
        else:
            stabilizer = jnp.max(data_dash, axis=(-1, -2), keepdims=True)
    return ratio * (jnp.exp(data_dash - diag_data - stabilizer) + eps)


def generalized_kernel_features(
    data: jax.Array,
    projection: Optional[jax.Array],
    *,
    kernel_fn: Callable[[jax.Array], jax.Array] = jax.nn.relu,
    kernel_eps: float = 1e-3,
) -> jax.Array:
    data = jnp.asarray(data, jnp.float32)
    d = data.shape[-1]
    data_normalizer = d**-0.25
    if projection is None:
        return kernel_fn(data_normalizer * data) + kernel_eps
    data_dash = jnp.einsum("...id,jd->...ij", data_normalizer * data, projection)
    return kernel_fn(data_dash) + kernel_eps


def _noncausal_linear_attention(q_p, k_p, v):
    k_sum = jnp.sum(k_p.astype(jnp.float32), axis=-2)  # (..., m)
    d_inv = 1.0 / jnp.maximum(
        jnp.einsum(
            "...nd,...d->...n",
            q_p.astype(jnp.float32),
            k_sum,
        ),
        1e-12,
    )
    context = jnp.einsum(
        "...nd,...ne->...de", k_p, v, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "...de,...nd,...n->...ne",
        context,
        q_p.astype(jnp.float32),
        d_inv,
    )


def _causal_linear_attention_chunked(
    q_p,
    k_p,
    v,
    chunk: int,
    init_state=None,
    return_state: bool = False,
    compute_dtype=jnp.float32,
):
    """q_p/k_p: (B, H, L, m); v: (B, H, L, d).  Scan over L/chunk chunks
    carrying (S: (B,H,m,d), z: (B,H,m)); ``init_state`` seeds the carry
    (sequence-parallel shards pass the prefix from earlier shards).

    ``compute_dtype=bfloat16`` runs the chunk matmuls with bf16
    operands on the MXU while keeping fp32 accumulation
    (``preferred_element_type``) and an fp32 (S, z) carry — the
    carry is only rounded per-chunk where it re-enters a matmul.
    fp32 (default) is bit-identical to the original path.
    """
    b, h, n, m = q_p.shape
    d = v.shape[-1]
    pad = (-n) % chunk
    if pad:
        q_p = jnp.pad(q_p, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k_p = jnp.pad(k_p, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nc = (n + pad) // chunk
    cd = compute_dtype
    qc = q_p.astype(cd).reshape(b, h, nc, chunk, m).transpose(2, 0, 1, 3, 4)
    kc = k_p.astype(cd).reshape(b, h, nc, chunk, m).transpose(2, 0, 1, 3, 4)
    vc = v.astype(cd).reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)

    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    def step(carry, inp):
        S, z = carry  # (b,h,m,d), (b,h,m) — fp32
        qi, ki, vi = inp  # (b,h,c,m), (b,h,c,m), (b,h,c,d) — cd
        # within-chunk causal part: (c,c) scores masked lower-triangular
        scores = (
            jnp.einsum("bhim,bhjm->bhij", qi, ki, preferred_element_type=jnp.float32)
            * tri
        )
        intra = jnp.einsum(
            "bhij,bhjd->bhid", scores.astype(cd), vi,
            preferred_element_type=jnp.float32,
        )
        inter = jnp.einsum(
            "bhim,bhmd->bhid", qi, S.astype(cd),
            preferred_element_type=jnp.float32,
        )
        num = intra + inter
        den = jnp.einsum("bhij->bhi", scores) + jnp.einsum(
            "bhim,bhm->bhi", qi, z.astype(cd),
            preferred_element_type=jnp.float32,
        )
        # clamp: padded rows have all-zero features → 0/0 would emit a
        # forward NaN in discarded rows whose *backward* (0-cotangent ÷
        # 0) still poisons the scan-carried gradients
        out_i = num / jnp.maximum(den, 1e-12)[..., None]
        S = S + jnp.einsum(
            "bhjm,bhjd->bhmd", ki, vi, preferred_element_type=jnp.float32
        )
        z = z + jnp.sum(ki.astype(jnp.float32), axis=-2)
        return (S, z), out_i

    if init_state is None:
        S0 = jnp.zeros((b, h, m, d), jnp.float32)
        z0 = jnp.zeros((b, h, m), jnp.float32)
    else:
        S0, z0 = init_state
    final_state, out = jax.lax.scan(step, (S0, z0), (qc, kc, vc))
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, d)
    out = out[:, :, :n]
    if return_state:
        return out, final_state
    return out


def favor_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    projection: Optional[jax.Array],
    *,
    causal: bool = True,
    generalized: bool = False,
    kernel_fn: Callable[[jax.Array], jax.Array] = jax.nn.relu,
    chunk: int = 128,
    stabilize_keys: bool = False,
    compute_dtype=jnp.float32,
    use_pallas_scan: bool = False,
    pallas_chunk: int = 128,
) -> jax.Array:
    """q,k,v: (B, H, L, d) → (B, H, L, d) in v's dtype.

    ``stabilize_keys=False`` (default) uses a zero key stabilizer so the
    batch path is bit-for-bit the same math as the incremental
    :func:`favor_attention_step` — a uniform key stabilizer cancels in
    the attention ratio anyway except through the +eps guard, and the
    eps distortion compounds across layers.  Set True to reproduce the
    original performer-pytorch global-max key stabilizer.

    ``compute_dtype=bfloat16`` runs the O(L·m·d) attention matmuls with
    bf16 operands (fp32 accumulation) — the training-throughput lever;
    feature maps (exp/softmax) and normalizing denominators stay fp32.
    """
    in_dtype = v.dtype
    if (
        use_pallas_scan
        and causal
        and not generalized
        and projection is not None
        and not stabilize_keys
    ):
        # fully fused path: feature maps + prefix scan in one Pallas
        # kernel (same math as below — zero key stabilizer)
        from synthanatomy_tpu.ops.favor_pallas import favor_attention_fused

        out = favor_attention_fused(
            jnp.asarray(q, compute_dtype),
            jnp.asarray(k, compute_dtype),
            jnp.asarray(v, compute_dtype),
            projection,
            pallas_chunk,
        )
        return out.astype(in_dtype)
    if generalized:
        q_p = generalized_kernel_features(q, projection, kernel_fn=kernel_fn)
        k_p = generalized_kernel_features(k, projection, kernel_fn=kernel_fn)
    elif projection is None:
        # the no_projection mode of the consumed implementation:
        # q softmaxed over features, k exponentiated (causal) /
        # softmaxed on the sequence (non-causal)
        q_p = jax.nn.softmax(jnp.asarray(q, jnp.float32), axis=-1)
        if causal:
            k_p = jnp.exp(jnp.asarray(k, jnp.float32))
        else:
            k_p = jax.nn.softmax(jnp.asarray(k, jnp.float32), axis=-2)
    else:
        q_p = softmax_kernel_features(q, projection, is_query=True)
        k_stab = None if stabilize_keys else jnp.zeros((), jnp.float32)
        k_p = softmax_kernel_features(
            k, projection, is_query=False, stabilizer=k_stab
        )
    v32 = jnp.asarray(v, jnp.float32)
    if causal:
        out = _causal_linear_attention_chunked(
            q_p, k_p, v32, chunk, compute_dtype=compute_dtype
        )
    else:
        out = _noncausal_linear_attention(
            q_p.astype(compute_dtype), k_p.astype(compute_dtype),
            v32.astype(compute_dtype),
        )
    return out.astype(in_dtype)


def favor_attention_sequence_parallel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    projection: Optional[jax.Array],
    *,
    axis_name: str,
    generalized: bool = False,
    kernel_fn: Callable[[jax.Array], jax.Array] = jax.nn.relu,
    chunk: int = 128,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Sequence-parallel causal FAVOR+ — call under ``shard_map`` with
    q/k/v sharded along L over mesh axis ``axis_name``.

    The running (K·Vᵀ, ΣK) prefix state is O(m·d) per head and
    *associative*, so context parallelism needs no ring attention
    (SURVEY.md §5.7): each shard reduces its own totals (two einsums),
    one ``all_gather`` of the O(m·d) states rides ICI, an exclusive
    prefix sum seeds the local chunked scan, and the shard finishes
    independently.  Exact — matches single-device
    :func:`favor_attention` to fp tolerance.
    """
    in_dtype = v.dtype
    if generalized:
        q_p = generalized_kernel_features(q, projection, kernel_fn=kernel_fn)
        k_p = generalized_kernel_features(k, projection, kernel_fn=kernel_fn)
    elif projection is None:
        # no_projection mode — same feature maps as the causal batch
        # path in favor_attention (:227-231): q softmaxed over features,
        # k exponentiated
        q_p = jax.nn.softmax(jnp.asarray(q, jnp.float32), axis=-1)
        k_p = jnp.exp(jnp.asarray(k, jnp.float32))
    else:
        q_p = softmax_kernel_features(q, projection, is_query=True)
        k_p = softmax_kernel_features(
            k, projection, is_query=False, stabilizer=jnp.zeros((), jnp.float32)
        )
    v32 = jnp.asarray(v, jnp.float32)

    # local totals (no scan needed)
    S_tot = jnp.einsum("bhjm,bhjd->bhmd", k_p, v32)
    z_tot = jnp.sum(k_p, axis=-2)

    # exclusive prefix over shards
    all_S = jax.lax.all_gather(S_tot, axis_name)  # (P, b, h, m, d)
    all_z = jax.lax.all_gather(z_tot, axis_name)
    p = all_S.shape[0]
    idx = jax.lax.axis_index(axis_name)
    mask = (jnp.arange(p) < idx).astype(jnp.float32)
    prefix_S = jnp.einsum("p,p...->...", mask, all_S)
    prefix_z = jnp.einsum("p,p...->...", mask, all_z)

    out = _causal_linear_attention_chunked(
        q_p, k_p, v32, chunk, init_state=(prefix_S, prefix_z),
        compute_dtype=compute_dtype,
    )
    return out.astype(in_dtype)


def favor_attention_step(
    q_t: jax.Array,
    k_t: jax.Array,
    v_t: jax.Array,
    state: Tuple[jax.Array, jax.Array],
    projection: Optional[jax.Array],
    *,
    generalized: bool = False,
    kernel_fn: Callable[[jax.Array], jax.Array] = jax.nn.relu,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Single-token incremental decode step.

    q_t/k_t/v_t: (B, H, d) for the current position; ``state`` is the
    running (S: (B,H,m,d), z: (B,H,m)) prefix statistics.  Returns
    (out_t (B,H,d), new_state).  This is the KV-cache equivalent for
    linear attention — O(m·d) per head regardless of history length,
    the core of the sampling speedup over the reference's
    re-run-the-full-forward loop (transformer.py:84-93).
    """
    S, z = state
    state_dtype = S.dtype  # bf16 accumulators trade ~1e-2 logit noise
    S = jnp.asarray(S, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    if generalized:
        q_p = generalized_kernel_features(q_t[..., None, :], projection, kernel_fn=kernel_fn)[..., 0, :]
        k_p = generalized_kernel_features(k_t[..., None, :], projection, kernel_fn=kernel_fn)[..., 0, :]
    elif projection is None:
        # no_projection mode (see favor_attention)
        q_p = jax.nn.softmax(jnp.asarray(q_t, jnp.float32), axis=-1)
        k_p = jnp.exp(jnp.asarray(k_t, jnp.float32))
    else:
        # query stab cancels per-position; key stab MUST be position-
        # uniform, so use 0 in step mode (see softmax_kernel_features)
        zero = jnp.zeros((), jnp.float32)
        q_p = softmax_kernel_features(q_t[..., None, :], projection, is_query=True)[..., 0, :]
        k_p = softmax_kernel_features(
            k_t[..., None, :], projection, is_query=False, stabilizer=zero
        )[..., 0, :]
    v32 = jnp.asarray(v_t, jnp.float32)
    S = S + jnp.einsum("bhm,bhd->bhmd", k_p, v32)
    z = z + k_p
    num = jnp.einsum("bhm,bhmd->bhd", q_p, S)
    den = jnp.maximum(jnp.einsum("bhm,bhm->bh", q_p, z), 1e-12)
    out = num / den[..., None]
    return out.astype(v_t.dtype), (S.astype(state_dtype), z.astype(state_dtype))
