"""SynthAnatomy-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
morphology-preserving autoregressive 3D generative modelling of the brain.

From-scratch rebuild of the capabilities of AmigoLab/SynthAnatomy
(MICCAI-2022 SASHIMI "Morphology-preserving Autoregressive 3D Generative
Modelling of the Brain"): a two-stage pipeline of a 3D VQ-VAE
(stage 1) and a Performer (FAVOR+) autoregressive prior over ordered
latent codebook indices (stage 2), designed TPU-first:

- SPMD data/model parallelism over ``jax.sharding.Mesh`` (no NCCL/DDP),
- bf16 compute with fp32 vector-quantization islands (no GradScaler),
- fused Pallas kernels for the VQ nearest-codeword search and the
  local-window attention heads,
- FAVOR+ causal attention as an associative scan,
- KV/prefix-state-cached incremental AR sampling inside ``lax.scan``
  (the reference re-runs the full forward per token:
  reference src/networks/transformers/transformer.py:84-93).
"""

__version__ = "0.1.0"
