"""Stage-2 (autoregressive prior) loss: token cross-entropy.

Rebuild of the reference ``CELoss``
(src/losses/transformer/transformer.py:10-36).  The reference inferer
transposes logits to (B, vocab, L) for ``F.cross_entropy``
(src/inferer/transformer.py:29); here logits stay (B, L, vocab) —
the natural layout — and the integer-label cross entropy is computed
directly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ce_loss"]


def ce_loss(
    logits: jax.Array, targets: jax.Array, *, mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mean cross-entropy of (B, L, V) fp logits vs (B, L) int targets.
    ``mask`` (B, L) optionally excludes positions (e.g. prepended
    conditioning slots)."""
    logits = jnp.asarray(logits, jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    if mask is not None:
        loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        loss = jnp.mean(nll)
    return loss, {"Loss-CE": loss}
