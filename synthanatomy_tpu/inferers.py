"""Forward-pass strategies ("inferers").

API-parity layer for the reference's inferer objects — callables
plugged into evaluators that decide *which* forward pass to run
(SURVEY.md §2.8):

- ``VQVAEExtractionInferer``  (src/inferer/vqvae.py:9-45):
  index_quantize → decode_samples, returning the reconstruction plus
  the ``quantization_i`` codebook indices;
- ``VQVAEDecodingInferer``    (src/inferer/vqvae.py:48-87):
  decode_samples on loaded latent index grids;
- ``TransformerTrainingInferer`` (src/inferer/transformer.py:10-29):
  next-token logits for the CE loss (kept (B, L, V) — the reference's
  channel-transpose is a torch cross_entropy artefact);
- ``TransformerInferenceInferer`` (src/inferer/transformer.py:32-71):
  KV-cached sampling with temperature / top-k / multinomial.

Each returns jitted-friendly pure functions over (variables, inputs).
These are the production forward strategies: the extracting/decoding
runners jit them directly (runners/vqvae.py), the transformer eval step
wraps ``TransformerTrainingInferer`` and the sampling runner drives
``TransformerInferenceInferer`` (DP serving uses
``models.sampling.make_dp_sampler`` — a shard_map wrapper around the
same sampler).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "VQVAEExtractionInferer",
    "VQVAEDecodingInferer",
    "TransformerTrainingInferer",
    "TransformerInferenceInferer",
]


class VQVAEExtractionInferer:
    def __init__(self, model, d_model=None):
        self.model = model
        self.d_model = d_model

    def __call__(
        self, variables, images: jax.Array, d_variables=None
    ) -> Dict[str, Any]:
        idx = self.model.apply(variables, images, method=self.model.index_quantize)
        recon = self.model.apply(variables, idx, method=self.model.decode_samples)
        out = {"reconstruction": [recon]}
        for i, q in enumerate(idx):
            out[f"quantization_{i}"] = q
        if self.d_model is not None and d_variables is not None:
            out["adversarial_logits"] = self.d_model.apply(
                d_variables, recon.astype(jnp.float32), training=False
            )
        return out


class VQVAEDecodingInferer:
    def __init__(self, model, d_model=None):
        self.model = model
        self.d_model = d_model

    def __call__(
        self, variables, quantizations: Sequence[jax.Array], d_variables=None
    ) -> Dict[str, Any]:
        recon = self.model.apply(
            variables, list(quantizations), method=self.model.decode_samples
        )
        out = {"sample": [recon]}
        if self.d_model is not None and d_variables is not None:
            out["adversarial_logits"] = self.d_model.apply(
                d_variables, recon.astype(jnp.float32), training=False
            )
        return out


class TransformerTrainingInferer:
    def __init__(self, model):
        self.model = model

    def __call__(self, variables, inputs: jax.Array, conditionings=None) -> jax.Array:
        return self.model.apply(variables, inputs, conditionings)


class TransformerInferenceInferer:
    def __init__(
        self,
        model,
        ordering,
        *,
        batch: int,
        sample: bool = True,
        temperature: float = 1.0,
        top_k: Optional[int] = None,
        with_conditionings: bool = False,
        ring_quant: bool = False,
        fused="auto",
    ):
        from synthanatomy_tpu.models.sampling import make_sampler

        self._sampler = make_sampler(
            model, ordering, batch=batch, do_sample=sample,
            temperature=temperature, top_k=top_k,
            with_conditionings=with_conditionings,
            ring_quant=ring_quant, fused=fused,
        )
        self.with_conditionings = with_conditionings

    def __call__(self, variables, rng: jax.Array, conditionings=None) -> jax.Array:
        if self.with_conditionings:
            return self._sampler(variables, rng, conditionings)
        return self._sampler(variables, rng)
