"""Adversarial (GAN) criteria.

Rebuild of the reference ``AdversarialLoss``
(src/losses/adversarial/adversarial.py:11-105; enum
src/losses/adversarial/utils.py:4-8; factory weight 0.005,
configure.py:18-36):

- ``vanilla``:      relu(1 ± logits)       (hinge form)
- ``hinge``:        softplus(± logits)
- ``least_square``: (logits − target)²

Discriminator mode averages the fake and real halves with 0.5; the
returned summaries use the reference's TB names.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "ADVERSARIAL_CRITERIA",
    "get_criterion",
    "generator_loss",
    "discriminator_loss",
]

ADVERSARIAL_CRITERIA = ("vanilla", "hinge", "least_square")


def get_criterion(name: str) -> Callable[[jax.Array, bool], jax.Array]:
    if name == "vanilla":
        return lambda logits, is_real: jax.nn.relu(
            1.0 + (-1.0 if is_real else 1.0) * logits
        )
    if name == "hinge":
        return lambda logits, is_real: jax.nn.softplus(
            (-1.0 if is_real else 1.0) * logits
        )
    if name == "least_square":
        return lambda logits, is_real: jnp.square(
            logits - (1.0 if is_real else 0.0)
        )
    raise ValueError(
        f"Unknown adversarial criterion {name!r}; choices are {ADVERSARIAL_CRITERIA}."
    )


def generator_loss(
    logits_fake: jax.Array, *, criterion: str = "least_square", weight: float = 0.005
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Generator-side loss: fake logits scored as real."""
    fn = get_criterion(criterion)
    loss_fake = jnp.mean(fn(jnp.asarray(logits_fake, jnp.float32), True))
    summaries = {"Loss-Adversarial_Generator-Reconstruction": loss_fake}
    return weight * loss_fake, summaries


def discriminator_loss(
    logits_fake: jax.Array,
    logits_real: jax.Array,
    *,
    criterion: str = "least_square",
    weight: float = 0.005,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Discriminator-side loss: 0.5·(fake-as-fake + real-as-real)."""
    fn = get_criterion(criterion)
    loss_fake = jnp.mean(fn(jnp.asarray(logits_fake, jnp.float32), False))
    loss_real = jnp.mean(fn(jnp.asarray(logits_real, jnp.float32), True))
    summaries = {
        "Loss-Adversarial_Discriminator-Reconstruction": loss_fake,
        "Loss-Adversarial_Discriminator-Originals": loss_real,
    }
    return weight * 0.5 * (loss_fake + loss_real), summaries
