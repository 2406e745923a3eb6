"""Transformer CE metric (reference src/metrics/transformer.py:11-49)."""

from __future__ import annotations

import jax

from synthanatomy_tpu.losses.transformer import ce_loss

__all__ = ["ce_metric"]


def ce_metric(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return ce_loss(logits, targets)[0]
