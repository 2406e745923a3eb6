"""Stage-2 network: Performer autoregressive prior (flax.linen).

First-party TPU rebuild of the reference Performer wrapper
(src/networks/transformers/performer.py:70-288) **and** of the
``performer-pytorch`` internals it consumes (FAVOR+ fast attention,
hybrid local heads, ReZero/ScaleNorm/GLU options):

- token embedding with a BOS slot (``num_tokens = vocab_size + 1``,
  reference run_transformer.py:71);
- mutually-exclusive positional embeddings: absolute-learned /
  fixed-sinusoidal / axial / rotary(+per-layer rotary on q,k)
  (performer.py:128-148);
- spatial positional embeddings re-injecting 3D coordinates after
  flattening, 'absolute' (learned) or 'fixed' (sinusoidal), with the
  right-shift-for-BOS padding (performer.py:23-67, 152-184);
- conditioning embeddings with 'bos_replacement' and 'prepending'
  injection (performer.py:186-190, 252-264, 279-280);
- per-layer FAVOR+ random-feature projections stored in a mutable
  ``"favor"`` collection so the redraw schedule
  (``feature_redraw_interval``, performer.py:223-227) becomes an
  explicit ``redraw_projections`` call from the training loop;
- hybrid heads: ``local_attn_heads`` use blocked local-window causal
  attention with rotary rel-pos, the rest FAVOR+ (chunked prefix scan);
- incremental decode path (``decode_step`` + ``init_cache``) carrying
  O(m·d) prefix state per global head and an O(window) ring buffer per
  local head — the KV-cache answer to the reference's
  re-run-everything sampling loop (transformer.py:84-93);
- ``reversible`` maps to ``jax.checkpoint`` rematerialisation (the
  TPU-idiomatic memory/compute trade the reference gets from torch
  reversible nets).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from synthanatomy_tpu.models.ordering import Ordering
from synthanatomy_tpu.ops.favor import (
    default_nb_features,
    favor_attention,
    favor_attention_step,
    gaussian_orthogonal_random_matrix,
)
from synthanatomy_tpu.ops.local_attention import (
    apply_rotary,
    local_attention,
    local_attention_step,
    rotary_sin_cos,
)
from synthanatomy_tpu.ops.local_attention_pallas import local_attention_flash

__all__ = ["Performer", "PerformerCache"]

PerformerCache = Dict[str, Any]


def _on_tpu_default_device() -> bool:
    """True when traced computation will execute on TPU (honours the
    `with jax.default_device(cpu)` host-init pattern) — gates Pallas
    kernels that have no CPU lowering."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


def spatial_coordinate_sequences(
    spatial_shape: Sequence[int], ordering: "Ordering"
) -> List[np.ndarray]:
    """Per-axis grid-coordinate values, flattened raster-first and
    permuted into sequence order (reference performer.py:163-171).

    Shared by ``Performer.setup`` and the sequence-parallel train step
    (`parallel/sequence_parallel.py`) so the spatial-table lookup
    indices can never drift between training paths and inference.
    """
    coords = np.meshgrid(
        *[np.arange(s) for s in spatial_shape], indexing="ij"
    )
    return [np.asarray(ordering(c.reshape(-1))) for c in coords]


def spatial_lookup_layout(
    seqs: Sequence[np.ndarray], n: int, k_pre: int = 0, total: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Static lookup layout for the BOS-right-shifted 'absolute'
    spatial tables, shared by the SP and TP train steps so the shift
    math can never drift from ``Performer._spatial_pos_sum`` (which
    embeds ``seq[:-1]``: position k_pre is the BOS zero row, position
    k_pre+q ≥ k_pre+1 gets grid cell q-1's coords; at most L_grid-1
    rows carry an embedding).

    Returns ``(idx (total, n_axes) int32, mask (total, 1) float32)``
    over ``total`` physical positions (default ``n``): the embedding
    sum at position p is ``Σᵢ tableᵢ[idx[p, i]] * mask[p]``.
    """
    total = n if total is None else total
    idx = np.zeros((total, len(seqs)), np.int32)
    mask = np.zeros((total, 1), np.float32)
    m_rows = min(n - 1, len(seqs[0]) - 1, total - k_pre - 1)
    for i, s in enumerate(seqs):
        idx[k_pre + 1 : k_pre + 1 + m_rows, i] = s[:m_rows]
    mask[k_pre + 1 : k_pre + 1 + m_rows] = 1.0
    return idx, mask


def _sinusoidal_table(length: int, dim: int) -> np.ndarray:
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = np.arange(length, dtype=np.float64)
    sinusoid = np.einsum("i,j->ij", pos, inv_freq)
    return np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1).astype(
        np.float32
    )


class ScaleNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) / jnp.maximum(n, self.eps) * g).astype(x.dtype)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    glu: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.dim * self.mult
        if self.glu:
            h = nn.Dense(inner * 2, dtype=self.dtype, name="w1")(x)
            a, g = jnp.split(h, 2, axis=-1)
            h = a * nn.gelu(g)
        else:
            h = nn.Dense(inner, dtype=self.dtype, name="w1")(x)
            h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="w2")(h)


class PerformerAttention(nn.Module):
    """Hybrid FAVOR+/local multi-head self-attention."""

    dim: int
    heads: int
    dim_head: int
    local_heads: int = 0
    local_window: int = 256
    nb_features: Optional[int] = None
    causal: bool = True
    generalized: bool = False
    qkv_bias: bool = False
    out_bias: bool = False
    dropout: float = 0.0
    scan_chunk: int = 128
    no_projection: bool = False
    # flash-style Pallas local-attention kernels (fwd+bwd): 2.3x the
    # XLA batch path at the paper shape (auto-fallback off-TPU)
    use_pallas_local: bool = False
    # fused Pallas FAVOR+ causal-scan kernels (fwd + two-sweep bwd),
    # VMEM-resident prefix state (auto-fallback off-TPU)
    use_pallas_favor: bool = False
    # dtype of the FAVOR (S, z) decode accumulators: fp32 is exact;
    # bf16 is ~20% faster sampling with ~1e-2 relative logit noise
    # after 1400 accumulations (opt in for throughput-bound serving)
    favor_cache_dtype: Any = jnp.float32
    # operand dtype of the batch-path attention matmuls (FAVOR chunk
    # scan + local-window scores); accumulation is always fp32.
    # bfloat16 is the training-throughput lever; fp32 is bit-exact
    # with the incremental decode path.
    attn_compute_dtype: Any = jnp.float32
    # set under shard_map sequence parallelism (parallel/
    # sequence_parallel.py): attention runs the SP variants (prefix-
    # state all_gather for FAVOR, halo exchange for local heads) over
    # this mesh axis; the module then computes on an L-shard
    sp_axis: Any = None
    dtype: Any = jnp.bfloat16

    @property
    def _nb_features(self) -> int:
        return self.nb_features or default_nb_features(self.dim_head)

    def setup(self):
        inner = self.heads * self.dim_head
        self.to_q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")
        self.to_k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")
        self.to_v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")
        self.to_out = nn.Dense(self.dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out")
        self.drop = nn.Dropout(self.dropout)
        if self.heads - self.local_heads > 0 and not self.no_projection:
            self.projection = self.variable(
                "favor",
                "projection",
                lambda: gaussian_orthogonal_random_matrix(
                    self.make_rng("favor")
                    if self.has_rng("favor")
                    else jax.random.key(0),
                    self._nb_features,
                    self.dim_head,
                ),
            )

    def _proj(self):
        return None if self.no_projection else self.projection.value

    def _split_heads(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

    def __call__(
        self,
        x,
        *,
        layer_rotary: Optional[Tuple[jax.Array, jax.Array]] = None,
        deterministic: bool = True,
    ):
        b, n, _ = x.shape
        q = self._split_heads(self.to_q(x))
        k = self._split_heads(self.to_k(x))
        v = self._split_heads(self.to_v(x))

        if layer_rotary is not None:
            sin, cos = layer_rotary
            q = apply_rotary(q.astype(jnp.float32), sin[:n], cos[:n]).astype(q.dtype)
            k = apply_rotary(k.astype(jnp.float32), sin[:n], cos[:n]).astype(k.dtype)

        gh = self.heads - self.local_heads
        outs = []
        if self.sp_axis is not None:
            from synthanatomy_tpu.ops.favor import (
                favor_attention_sequence_parallel,
            )
            from synthanatomy_tpu.ops.local_attention import (
                local_attention_sequence_parallel,
            )

            if self.causal is False or layer_rotary is not None:
                raise NotImplementedError(
                    "sequence parallelism supports causal attention "
                    "without per-layer rotary"
                )
            if gh > 0:
                outs.append(
                    favor_attention_sequence_parallel(
                        q[:, :gh], k[:, :gh], v[:, :gh], self._proj(),
                        axis_name=self.sp_axis,
                        generalized=self.generalized,
                        chunk=self.scan_chunk,
                        compute_dtype=self.attn_compute_dtype,
                    )
                )
            if self.local_heads > 0:
                outs.append(
                    local_attention_sequence_parallel(
                        q[:, gh:], k[:, gh:], v[:, gh:],
                        window=self.local_window,
                        axis_name=self.sp_axis,
                        compute_dtype=self.attn_compute_dtype,
                    )
                )
            out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
            out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
            out = self.to_out(out)
            return self.drop(out, deterministic=deterministic)
        if gh > 0:
            outs.append(
                favor_attention(
                    q[:, :gh],
                    k[:, :gh],
                    v[:, :gh],
                    self._proj(),
                    causal=self.causal,
                    generalized=self.generalized,
                    chunk=self.scan_chunk,
                    compute_dtype=self.attn_compute_dtype,
                    use_pallas_scan=self.use_pallas_favor
                    and _on_tpu_default_device(),
                )
            )
        if self.local_heads > 0:
            if self.use_pallas_local:
                local_out = local_attention_flash(
                    q[:, gh:], k[:, gh:], v[:, gh:],
                    window=self.local_window, causal=self.causal,
                    compute_dtype=self.attn_compute_dtype,
                )
            else:
                local_out = local_attention(
                    q[:, gh:], k[:, gh:], v[:, gh:],
                    window=self.local_window, causal=self.causal,
                    compute_dtype=self.attn_compute_dtype,
                )
            outs.append(local_out)
        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        out = self.to_out(out)
        return self.drop(out, deterministic=deterministic)

    # -- incremental decoding -------------------------------------------

    def init_cache(self, batch: int) -> Dict[str, jax.Array]:
        gh = self.heads - self.local_heads
        # no_projection features live in the raw head dim
        m = self.dim_head if self.no_projection else self._nb_features
        cache: Dict[str, jax.Array] = {}
        if gh > 0:
            cache["S"] = jnp.zeros(
                (batch, gh, m, self.dim_head), self.favor_cache_dtype
            )
            cache["z"] = jnp.zeros((batch, gh, m), self.favor_cache_dtype)
        if self.local_heads > 0:
            # ring buffers in compute dtype: cache traffic dominates the
            # local-head decode cost, fp32 numerics only needed for the
            # FAVOR accumulators above
            cache["ck"] = jnp.zeros(
                (batch, self.local_heads, self.local_window, self.dim_head),
                self.dtype,
            )
            cache["cv"] = jnp.zeros(
                (batch, self.local_heads, self.local_window, self.dim_head),
                self.dtype,
            )
        return cache

    def step(
        self,
        x_t: jax.Array,
        cache: Dict[str, jax.Array],
        t: jax.Array,
        *,
        layer_rotary: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """x_t: (B, dim) at position t → (out_t, new_cache)."""
        b = x_t.shape[0]
        x1 = x_t[:, None, :]
        q = self._split_heads(self.to_q(x1))[:, :, 0]  # (B, H, d)
        k = self._split_heads(self.to_k(x1))[:, :, 0]
        v = self._split_heads(self.to_v(x1))[:, :, 0]

        if layer_rotary is not None:
            sin, cos = layer_rotary
            sin_t = jax.lax.dynamic_slice_in_dim(sin, t, 1, axis=0)
            cos_t = jax.lax.dynamic_slice_in_dim(cos, t, 1, axis=0)
            q = apply_rotary(q.astype(jnp.float32)[..., None, :], sin_t, cos_t)[..., 0, :].astype(q.dtype)
            k = apply_rotary(k.astype(jnp.float32)[..., None, :], sin_t, cos_t)[..., 0, :].astype(k.dtype)

        gh = self.heads - self.local_heads
        new_cache = dict(cache)
        outs = []
        if gh > 0:
            o, (S, z) = favor_attention_step(
                q[:, :gh], k[:, :gh], v[:, :gh],
                (cache["S"], cache["z"]),
                self._proj(),
                generalized=self.generalized,
            )
            new_cache["S"], new_cache["z"] = S, z
            outs.append(o)
        if self.local_heads > 0:
            o, ck, cv = local_attention_step(
                q[:, gh:], k[:, gh:], v[:, gh:],
                cache["ck"], cache["cv"], t,
                window=self.local_window,
            )
            new_cache["ck"], new_cache["cv"] = ck, cv
            outs.append(o)
        out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        out = out.reshape(b, -1)
        return self.to_out(out[:, None, :])[:, 0], new_cache


class PerformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    local_heads: int
    local_window: int
    nb_features: Optional[int]
    causal: bool
    generalized: bool
    ff_mult: int
    ff_glu: bool
    ff_dropout: float
    attn_dropout: float
    use_scalenorm: bool
    use_rezero: bool
    qkv_bias: bool
    attn_out_bias: bool
    scan_chunk: int
    no_projection: bool
    use_pallas_local: bool
    use_pallas_favor: bool
    remat_attention: bool
    favor_cache_dtype: Any
    attn_compute_dtype: Any
    dtype: Any
    sp_axis: Any = None

    def setup(self):
        attn_cls = (
            nn.remat(PerformerAttention, static_argnums=())
            if self.remat_attention
            else PerformerAttention
        )
        self.attn = attn_cls(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            local_heads=self.local_heads, local_window=self.local_window,
            nb_features=self.nb_features, causal=self.causal,
            generalized=self.generalized, qkv_bias=self.qkv_bias,
            out_bias=self.attn_out_bias, dropout=self.attn_dropout,
            scan_chunk=self.scan_chunk, no_projection=self.no_projection,
            use_pallas_local=self.use_pallas_local,
            use_pallas_favor=self.use_pallas_favor,
            favor_cache_dtype=self.favor_cache_dtype,
            attn_compute_dtype=self.attn_compute_dtype,
            sp_axis=self.sp_axis, dtype=self.dtype,
            name="attn",
        )
        self.ff = FeedForward(
            self.dim, self.ff_mult, self.ff_glu, self.ff_dropout, self.dtype,
            name="ff",
        )
        if self.use_rezero:
            self.g_attn = self.param("g_attn", nn.initializers.zeros, (1,), jnp.float32)
            self.g_ff = self.param("g_ff", nn.initializers.zeros, (1,), jnp.float32)
        elif self.use_scalenorm:
            self.norm_attn = ScaleNorm(name="norm_attn")
            self.norm_ff = ScaleNorm(name="norm_ff")
        else:
            self.norm_attn = nn.LayerNorm(dtype=self.dtype, name="norm_attn")
            self.norm_ff = nn.LayerNorm(dtype=self.dtype, name="norm_ff")

    def _pre_attn(self, x):
        return x if self.use_rezero else self.norm_attn(x)

    def _pre_ff(self, x):
        return x if self.use_rezero else self.norm_ff(x)

    def __call__(self, x, *, layer_rotary=None, deterministic: bool = True):
        a = self.attn(
            self._pre_attn(x), layer_rotary=layer_rotary, deterministic=deterministic
        )
        if self.use_rezero:
            a = a * self.g_attn
        x = x + a
        f = self.ff(self._pre_ff(x), deterministic=deterministic)
        if self.use_rezero:
            f = f * self.g_ff
        return x + f

    def init_cache(self, batch: int):
        return self.attn.init_cache(batch)

    def step(self, x_t, cache, t, *, layer_rotary=None):
        a, new_cache = self.attn.step(
            self._pre_attn(x_t[:, None, :])[:, 0], cache, t, layer_rotary=layer_rotary
        )
        if self.use_rezero:
            a = a * self.g_attn
        x_t = x_t + a
        f = self.ff(self._pre_ff(x_t[:, None, :]), deterministic=True)[:, 0]
        if self.use_rezero:
            f = f * self.g_ff
        return x_t + f, new_cache


class Performer(nn.Module):
    """See module docstring.  Sequences are (B, L) int tokens."""

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    local_attn_heads: int = 0
    local_window_size: int = 256
    causal: bool = True
    ff_mult: int = 4
    nb_features: Optional[int] = None
    feature_redraw_interval: int = 1000
    reversible: bool = False
    ff_chunks: int = 1  # accepted for API parity; XLA needs no chunking
    ff_glu: bool = False
    emb_dropout: float = 0.0
    ff_dropout: float = 0.0
    attn_dropout: float = 0.0
    generalized_attention: bool = False
    use_scalenorm: bool = False
    use_rezero: bool = False
    tie_embed: bool = False
    rotary_position_emb: bool = False
    fixed_position_emb: bool = False
    axial_position_emb: bool = False
    axial_position_shape: Optional[Tuple[int, int]] = None
    qkv_bias: bool = False
    attn_out_bias: bool = False
    no_projection: bool = False
    cross_attend: bool = False
    use_pallas_local: bool = False
    use_pallas_favor: bool = False
    # remat only the attention sub-blocks (cheaper than full
    # `reversible` block remat when FF activations fit)
    remat_attention: bool = False
    favor_cache_dtype: Any = jnp.float32
    attn_compute_dtype: Any = jnp.float32
    spatial_position_emb: Optional[str] = None
    spatial_shape: Optional[Tuple[int, ...]] = None
    ordering: Optional[Ordering] = None
    conditioning_num_tokens: Optional[Tuple[int, ...]] = None
    conditioning_type: str = "none"
    scan_chunk: int = 128
    dtype: Any = jnp.bfloat16

    @property
    def effective_seq_len(self) -> int:
        extra = (
            len(self.conditioning_num_tokens)
            if self.conditioning_num_tokens and self.conditioning_type == "prepending"
            else 0
        )
        return self.max_seq_len + extra

    def setup(self):
        if sum([self.rotary_position_emb, self.fixed_position_emb, self.axial_position_emb]) > 1:
            raise ValueError(
                "rotary_position_emb, fixed_position_emb and axial_position_emb "
                "are mutually exclusive"
            )
        if self.spatial_position_emb is not None:
            if self.spatial_position_emb not in ("fixed", "absolute"):
                raise ValueError(
                    "spatial_position_emb must be 'fixed' or 'absolute', got "
                    f"{self.spatial_position_emb!r}"
                )
            if self.spatial_shape is None or self.ordering is None:
                raise ValueError(
                    "spatial_position_emb requires spatial_shape and ordering"
                )

        if self.cross_attend:
            raise NotImplementedError(
                "cross_attend is accepted for API parity with the consumed "
                "performer implementation but no reference code path feeds "
                "a cross-attention context; file an issue if needed"
            )
        L = self.effective_seq_len
        self.token_emb = nn.Embed(
            self.num_tokens, self.dim, dtype=self.dtype, name="token_emb"
        )

        # ---- sequence-level positional embedding
        if self.rotary_position_emb or self.fixed_position_emb:
            self._fixed_pos = jnp.asarray(_sinusoidal_table(L, self.dim))
        elif self.axial_position_emb:
            shape = self.axial_position_shape or (math.ceil(L / 64), 64)
            self.axial_emb_0 = self.param(
                "axial_emb_0", nn.initializers.normal(1.0), (shape[0], 1, self.dim),
                jnp.float32,
            )
            self.axial_emb_1 = self.param(
                "axial_emb_1", nn.initializers.normal(1.0), (1, shape[1], self.dim),
                jnp.float32,
            )
            self._axial_shape = shape
        else:
            self.abs_pos_emb = nn.Embed(
                L, self.dim, dtype=self.dtype, name="abs_pos_emb"
            )

        # per-layer rotary on q/k (only in rotary mode)
        if self.rotary_position_emb:
            sin, cos = rotary_sin_cos(self.dim_head, jnp.arange(L))
            self._layer_rotary = (sin, cos)
        else:
            self._layer_rotary = None

        # ---- spatial coordinate embeddings (performer.py:152-184)
        if self.spatial_position_emb is not None:
            axes = range(len(self.spatial_shape))
            seqs = spatial_coordinate_sequences(self.spatial_shape, self.ordering)
            self._spatial_sequences = seqs  # list of (L_grid,) coordinate values
            if self.spatial_position_emb == "absolute":
                self.spatial_embs = [
                    nn.Embed(
                        len(seqs[i]), self.dim, dtype=self.dtype,
                        name=f"spatial_emb_{i}",
                    )
                    for i in axes
                ]
            else:
                self._spatial_fixed = [
                    jnp.asarray(
                        _sinusoidal_table(int(seqs[i].max()) + 1, self.dim)[seqs[i]]
                    )
                    for i in axes
                ]

        # ---- conditioning embeddings
        if self.conditioning_num_tokens:
            self.conditioning_embs = [
                nn.Embed(cnt, self.dim, dtype=self.dtype, name=f"conditioning_emb_{i}")
                for i, cnt in enumerate(self.conditioning_num_tokens)
            ]

        self.emb_drop = nn.Dropout(self.emb_dropout)

        block = PerformerBlock
        if self.reversible:
            block = nn.remat(PerformerBlock, static_argnums=())
        self.blocks = [
            block(
                self.dim, self.heads, self.dim_head, self.local_attn_heads,
                self.local_window_size, self.nb_features, self.causal,
                self.generalized_attention, self.ff_mult, self.ff_glu,
                self.ff_dropout, self.attn_dropout, self.use_scalenorm,
                self.use_rezero, self.qkv_bias, self.attn_out_bias,
                self.scan_chunk, self.no_projection, self.use_pallas_local,
                self.use_pallas_favor,
                self.remat_attention, self.favor_cache_dtype,
                self.attn_compute_dtype, self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype, name="final_norm")
        if not self.tie_embed:
            self.to_out = nn.Dense(self.num_tokens, dtype=self.dtype, name="to_out")

    # ------------------------------------------------------------------

    def _spatial_pos_sum(self, n: int) -> Optional[jax.Array]:
        """Σ per-axis coordinate embeddings, right-shifted for BOS
        (reference performer.py:23-67): position 0 gets zeros, position
        p ≥ 1 gets the coords of grid cell p-1."""
        if self.spatial_position_emb is None:
            return None
        total = None
        for i, seq in enumerate(self._spatial_sequences):
            if self.spatial_position_emb == "absolute":
                emb = self.spatial_embs[i](jnp.asarray(seq[:-1]))  # (L_grid-1, dim)
            else:
                emb = self._spatial_fixed[i][:-1]
            emb = emb[: n - 1]
            emb = jnp.pad(emb, ((1, 0), (0, 0)))
            if emb.shape[0] < n:
                emb = jnp.pad(emb, ((0, n - emb.shape[0]), (0, 0)))
            total = emb if total is None else total + emb
        return total[None]

    def _pos_emb(self, n: int) -> jax.Array:
        if self.rotary_position_emb or self.fixed_position_emb:
            return self._fixed_pos[None, :n]
        if self.axial_position_emb:
            s0, s1 = self._axial_shape
            full = (self.axial_emb_0 + self.axial_emb_1).reshape(s0 * s1, self.dim)
            return full[None, :n]
        return self.abs_pos_emb(jnp.arange(n))[None]

    def _embed_prefix(
        self,
        x: jax.Array,
        conditionings: Optional[Sequence[jax.Array]],
    ) -> jax.Array:
        """Token + spatial embeddings + conditioning injection (before
        the sequence positional embedding)."""
        h = self.token_emb(x)
        sp = self._spatial_pos_sum(h.shape[1])
        if sp is not None:
            h = h + sp.astype(h.dtype)

        if conditionings is not None and self.conditioning_type != "none":
            if self.conditioning_type == "bos_replacement":
                c = jnp.zeros_like(h[:, :1])
                for idx, emb in enumerate(self.conditioning_embs):
                    c = c + emb(conditionings[idx]).reshape(h.shape[0], 1, self.dim)
                h = jnp.concatenate([c, h[:, 1:]], axis=1)
            elif self.conditioning_type == "prepending":
                pre = [
                    emb(conditionings[idx]).reshape(h.shape[0], 1, self.dim)
                    for idx, emb in enumerate(self.conditioning_embs)
                ]
                h = jnp.concatenate(pre + [h], axis=1)
        return h

    def __call__(
        self,
        x: jax.Array,
        conditionings: Optional[Sequence[jax.Array]] = None,
        *,
        return_encodings: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: (B, L) int tokens → (B, L, num_tokens) logits (conditioning
        positions stripped in 'prepending' mode, performer.py:279-280)."""
        n_in = x.shape[1]
        if n_in > self.max_seq_len:
            raise ValueError(
                f"sequence length {n_in} must be ≤ max_seq_len {self.max_seq_len}"
            )
        h = self._embed_prefix(x, conditionings)
        n = h.shape[1]
        h = h + self._pos_emb(n).astype(h.dtype)
        h = self.emb_drop(h, deterministic=deterministic)

        for blk in self.blocks:
            h = blk(h, layer_rotary=self._layer_rotary, deterministic=deterministic)

        h = self.final_norm(h)

        if conditionings is not None and self.conditioning_type == "prepending":
            h = h[:, len(self.conditioning_embs):]

        if return_encodings:
            return h
        if self.tie_embed:
            return h @ self.token_emb.embedding.T.astype(h.dtype)
        return self.to_out(h)

    # ------------------------------------------------------------------
    # incremental decoding
    # ------------------------------------------------------------------

    @property
    def n_prepend(self) -> int:
        return (
            len(self.conditioning_num_tokens)
            if self.conditioning_num_tokens and self.conditioning_type == "prepending"
            else 0
        )

    def init_cache(self, batch: int) -> List[Dict[str, jax.Array]]:
        return [blk.init_cache(batch) for blk in self.blocks]

    def _run_blocks_step(self, h, cache, t_global):
        new_cache = []
        for blk, blk_cache in zip(self.blocks, cache):
            h, c = blk.step(h, blk_cache, t_global, layer_rotary=self._layer_rotary)
            new_cache.append(c)
        return h, new_cache

    def prime_cache(
        self,
        cache: List[Dict[str, jax.Array]],
        conditionings: Sequence[jax.Array],
    ) -> List[Dict[str, jax.Array]]:
        """'prepending' mode: push the conditioning embeddings through
        the stack as the first ``n_prepend`` positions (their logits are
        discarded, matching the batch path's output stripping,
        performer.py:279-280)."""
        pos_table = self._pos_emb(self.effective_seq_len)[0]
        for idx, emb in enumerate(self.conditioning_embs):
            h = emb(conditionings[idx]).reshape(-1, self.dim)
            h = h + pos_table[idx].astype(h.dtype)
            _, cache = self._run_blocks_step(h, cache, jnp.asarray(idx, jnp.int32))
        return cache

    def _pos_emb_at(self, t_global: jax.Array) -> jax.Array:
        """O(dim) positional row at one position — avoids building the
        full (L, dim) table inside the decode scan every step."""
        if self.rotary_position_emb or self.fixed_position_emb:
            inv_freq = 1.0 / (
                10000 ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim)
            )
            s = t_global.astype(jnp.float32) * inv_freq
            return jnp.concatenate([jnp.sin(s), jnp.cos(s)], axis=-1)
        if self.axial_position_emb:
            s0, s1 = self._axial_shape
            return (
                self.axial_emb_0[t_global // s1, 0] + self.axial_emb_1[0, t_global % s1]
            )
        return self.abs_pos_emb(t_global)

    def _spatial_pos_at(self, t: jax.Array) -> Optional[jax.Array]:
        """Σ per-axis coordinate embeddings at token position ``t``:
        position 0 (BOS) → zeros; p ≥ 1 → coords of grid cell p-1."""
        if self.spatial_position_emb is None:
            return None
        total = None
        src = jnp.maximum(t - 1, 0)
        for i, seq in enumerate(self._spatial_sequences):
            coords = jnp.asarray(seq)
            coord = coords[jnp.minimum(src, coords.shape[0] - 1)]
            if self.spatial_position_emb == "absolute":
                row = self.spatial_embs[i](coord)
            else:
                row = self._spatial_fixed[i][jnp.minimum(src, coords.shape[0] - 1)]
            total = row if total is None else total + row
        return jnp.where(t == 0, jnp.zeros_like(total), total)

    def decode_step(
        self,
        token_t: jax.Array,
        cache: List[Dict[str, jax.Array]],
        t: jax.Array,
        conditionings: Optional[Sequence[jax.Array]] = None,
    ) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
        """token_t: (B,) int token at *token-sequence* position ``t``
        (0 = BOS) → (logits (B, num_tokens), new_cache).

        'bos_replacement' conditioning replaces the t==0 embedding by
        the conditioning sum; 'prepending' requires :meth:`prime_cache`
        first (positions are offset by ``n_prepend`` internally).
        """
        h = self.token_emb(token_t[:, None])[:, 0]  # (B, dim)

        sp = self._spatial_pos_at(t)
        if sp is not None:
            h = h + sp.astype(h.dtype)

        if (
            conditionings is not None
            and self.conditioning_type == "bos_replacement"
        ):
            c = jnp.zeros_like(h)
            for idx, emb in enumerate(self.conditioning_embs):
                c = c + emb(conditionings[idx]).reshape(h.shape[0], self.dim)
            h = jnp.where(t == 0, c, h)

        t_global = t + self.n_prepend
        h = h + self._pos_emb_at(t_global).astype(h.dtype)

        h, new_cache = self._run_blocks_step(h, cache, t_global)

        h = self.final_norm(h[:, None, :])[:, 0]
        if self.tie_embed:
            logits = h @ self.token_emb.embedding.T.astype(h.dtype)
        else:
            logits = self.to_out(h[:, None, :])[:, 0]
        return logits, new_cache


def redraw_projections(variables, rng: jax.Array):
    """Resample every layer's FAVOR+ random-feature projection — the
    functional form of performer-pytorch's
    ``feature_redraw_interval``/``check_redraw_projections``
    (reference performer.py:223-227).  Returns new variables.

    Jittable (static shapes, trace-time tree walk) — the paper config
    redraws every step (reference README.md:135
    ``--feature_redraw_interval=1``), so eager per-leaf dispatch here
    would serialize training through the device tunnel.  Key folding
    uses a STABLE hash of the collection keys: Python's ``hash()`` is
    salted per process for strings, which would give every host of a
    multi-process DP job a different projection draw and silently
    diverge the replicas."""
    import zlib

    import flax

    favor = variables.get("favor")
    if favor is None:
        return variables

    def _walk(node, key):
        out = {}
        for k, v in node.items():
            sub_key = jax.random.fold_in(
                key, zlib.crc32(str(k).encode()) & 0x7FFFFFFF
            )
            if isinstance(v, dict):
                out[k] = _walk(v, sub_key)
            else:
                out[k] = gaussian_orthogonal_random_matrix(
                    sub_key, v.shape[0], v.shape[1]
                )
        return out

    new_favor = _walk(flax.core.unfreeze(favor), rng)
    new_vars = dict(variables)
    new_vars["favor"] = new_favor
    return new_vars
