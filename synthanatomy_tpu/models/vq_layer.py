"""Reusable dimension-generic EMA vector-quantization layer.

The reference ships a second, *dead-code* VQ implementation
(``VectorQuantizerEMA``, src/layers/vector_quantization.py:9-198 —
never imported, SURVEY.md §2.3) that defines the intended reusable-
layer API: dimension-generic (2D/3D) quantization returning
flat/one-hot/indices plus an ``embed`` op, with a ``kaiming_uniform``
init option.  This module provides that API as a live, tested flax
layer over the same fused Pallas/XLA core as the production quantizer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from synthanatomy_tpu.ops import vq as vq_ops

__all__ = ["VectorQuantizerEMA"]


class VectorQuantizerEMA(nn.Module):
    """Channels-last EMA VQ for any spatial rank (inputs
    ``(B, *spatial, D)``)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5
    embedding_init: str = "normal"  # 'normal' | 'kaiming_uniform'
    use_pallas: Optional[bool] = None

    def setup(self):
        def _init():
            key = (
                self.make_rng("params")
                if self.has_rng("params")
                else jax.random.key(0)
            )
            return vq_ops.init_vq_state(
                key, self.num_embeddings, self.embedding_dim, self.embedding_init
            )

        self.state = self.variable("vq", "ema", _init)

    def __call__(
        self, x: jax.Array, *, training: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (quantized_st, commitment_loss)."""
        q, loss, idx, new_state = vq_ops.quantize_ema(
            self.state.value,
            x,
            decay=self.decay,
            commitment_cost=self.commitment_cost,
            training=training,
            eps=self.epsilon,
            use_pallas=self.use_pallas,
        )
        if training and not self.is_initializing():
            self.state.value = new_state
        return q, loss

    def quantize(
        self, x: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x (B, *s, D) → (flat_quantized (N, D), one_hot (N, K),
        indices (B, *s)) — the reference layer's ``quantize`` contract
        (vector_quantization.py:135-178)."""
        flat = jnp.asarray(x, jnp.float32).reshape(-1, self.embedding_dim)
        idx = vq_ops.nearest_codeword(
            flat, self.state.value.codebook, use_pallas=self.use_pallas
        )
        one_hot = jax.nn.one_hot(idx, self.num_embeddings, dtype=jnp.float32)
        flat_q = vq_ops.embed_indices(self.state.value, idx)
        return flat_q, one_hot, idx.reshape(x.shape[:-1])

    def embed(self, indices: jax.Array) -> jax.Array:
        """indices (B, *s) → codewords (B, *s, D)."""
        return vq_ops.embed_indices(self.state.value, indices)

    @property
    def perplexity_fn(self):
        return lambda idx: vq_ops.perplexity(idx, self.num_embeddings)
