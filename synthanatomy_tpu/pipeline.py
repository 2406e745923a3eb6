"""Two-stage synthesis pipeline (device-resident, no filesystem hop).

The reference's full brain synthesis is two separate CLI invocations
with a filesystem round-trip between them (`run_transformer
--mode=inference` → `.npy` → `run_vqvae --mode=decoding`,
SURVEY.md §3.4 + §3.2).  Here the sampled latents stay in HBM between
the two compiled stages:

- stage A: KV-cached AR sampling of the latent grids (one `lax.scan`);
- stage B: VQ-VAE decode, executed in sub-batches — a single fused
  program turned out slower (the decoder's multi-GB full-volume
  activations pressure the scan's memory layout) and large batches
  don't fit HBM in one decode anyway.

``make_synthesizer`` returns
``synthesize(performer_vars, vqvae_vars, rng[, conditionings]) ->
(volumes, latent_grids)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from synthanatomy_tpu.models.ordering import Ordering
from synthanatomy_tpu.models.sampling import make_sampler

__all__ = ["make_synthesizer"]


def make_synthesizer(
    performer,
    vqvae,
    ordering: Ordering,
    *,
    batch: int = 1,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    do_sample: bool = True,
    with_conditionings: bool = False,
    decode_batch: int = 8,
    ring_quant: bool = True,
):
    """Build the two-stage device-resident synthesis function."""
    sampler = make_sampler(
        performer, ordering, batch=batch, temperature=temperature,
        top_k=top_k, do_sample=do_sample,
        with_conditionings=with_conditionings,
        ring_quant=ring_quant,
    )
    db = min(decode_batch, batch)
    while batch % db != 0:
        db -= 1

    @jax.jit
    def decode_chunk(vqvae_vars, grids):
        return vqvae.apply(vqvae_vars, [grids], method=vqvae.decode_samples)

    def synthesize(performer_vars, vqvae_vars, rng, conditionings=None):
        if with_conditionings:
            grids = sampler(performer_vars, rng, conditionings)
        else:
            grids = sampler(performer_vars, rng)
        vols = [
            decode_chunk(vqvae_vars, grids[i : i + db])
            for i in range(0, batch, db)
        ]
        volumes = jnp.concatenate(vols, axis=0) if len(vols) > 1 else vols[0]
        return volumes, grids

    return synthesize
