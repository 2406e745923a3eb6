"""Stage-1 network: 3D VQ-VAE (flax.linen, channels-last, bf16 policy).

TPU-first rebuild of the reference ``BaselineVQVAE``
(src/networks/vqvae/baseline.py:163-362) and its ABC ``VQVAEBase``
(src/networks/vqvae/vqvae.py:8-192):

- topology parity: per-level ``Conv3d(k,s,p,dil) → ReLU →
  n_res_layers × ResidualLayer`` encoder with channel halving below the
  deepest level (baseline.py:213-246); ``Conv(embed_dim→C,3)`` →
  per-level res stacks → torch-semantics transposed convs (or sub-pixel
  upsample on the last level) decoder with **no output activation**
  (baseline.py:257-299);
- the EMA codebook lives in a mutable ``"vq"`` variable collection
  (explicit functional state — the idiomatic JAX answer to the
  reference's in-forward buffer mutation);
- ``decay`` / ``commitment_cost`` are *call-time arguments* so the
  reference's runtime param schedulers (set_ema_decay /
  set_commitment_cost, baseline.py:124-138) become plain scheduled
  scalars fed into the jitted step — no recompilation;
- compute runs in ``dtype`` (bf16 by default) with the VQ itself an
  fp32 island (ops/vq.py), replacing CUDA AMP/GradScaler;
- public ops mirror the ABC: ``encode / quantize / decode /
  index_quantize / decode_samples / __call__``; lists-of-one typing is
  kept at the API surface for future hierarchical VQ (run_vqvae.py:636).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from synthanatomy_tpu.ops import vq as vq_ops
from synthanatomy_tpu.ops.conv3d import conv3d, conv_transpose3d, subpixel_upsample3d
from synthanatomy_tpu.ops.res_stack_pallas import (
    fused_residual_layer,
    supports_fused_residual,
)
from synthanatomy_tpu.ops.vq import _running_on_tpu

__all__ = ["BaselineVQVAE", "ResidualLayer", "TorchConv3d", "TorchConvTranspose3d"]

# kaiming_uniform(a=√5) ≡ U(±√(1/fan_in)) — torch Conv3d's default init,
# kept so training dynamics match the reference
_torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# fused residual-layer auto-gate: below this voxel count the kernel
# measures break-even in isolation (40³-scale: 1.00×, BASELINE.md
# round 5) and each extra pallas boundary costs scheduling freedom in
# the full step — only the measured-win scale (80³-class) fuses by
# default; override via env for ablations
_FUSED_MIN_VOXELS = int(os.environ.get("SYNTH_FUSED_MIN_VOXELS", 500_000))


class TorchConv3d(nn.Module):
    """Conv3d with torch (k, s, p, dil) semantics, NDHWC/DHWIO layout."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = _torch_conv_init

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if params_only:
            # declare-and-return for callers that consume the params in
            # a fused kernel (ResidualLayer's fused path) — identical
            # names/shapes/init to the conv path, no compute
            return kernel, bias
        x = x.astype(self.dtype)
        return conv3d(
            x,
            kernel.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            bias=None if bias is None else bias.astype(self.dtype),
        )


class TorchConvTranspose3d(nn.Module):
    """ConvTranspose3d with torch (k, s, p, out_p, dil) semantics."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = _torch_conv_init

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return conv_transpose3d(
            x,
            kernel.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
            bias=None if bias is None else bias.astype(self.dtype),
        )


class SubpixelUpsample3d(nn.Module):
    """3×3×3 conv to ``features·scale³`` channels + depth-to-space
    (MONAI SubpixelUpsample equivalent, reference baseline.py:273-287)."""

    features: int
    scale: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        r3 = self.scale**3
        kernel = self.param(
            "kernel",
            _torch_conv_init,
            (3, 3, 3, x.shape[-1], self.features * r3),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features * r3,), jnp.float32
        )
        x = x.astype(self.dtype)
        return subpixel_upsample3d(
            x, kernel.astype(self.dtype), bias.astype(self.dtype), scale=self.scale
        )


class ResidualLayer(nn.Module):
    """Conv3d(3³, pad 1) → ReLU → Dropout → Conv3d(1³) with post-add
    ReLU (reference baseline.py:150-160; the 1³ second conv is the
    ``use_slim_residual`` behaviour; 3³ when slim is off).

    On TPU the whole layer runs as one halo-tiled Pallas kernel
    (ops/res_stack_pallas.py — read x once, write y once; fused
    backward) when the shape gate passes; ``use_fused`` overrides the
    auto gate (None = on-TPU auto).  The fused path reuses the exact
    TorchConv3d param declarations, so checkpoints are identical."""

    channels: int
    res_channels: int
    dropout: float = 0.0
    slim: bool = True
    dtype: Any = jnp.bfloat16
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        conv1 = TorchConv3d(
            self.res_channels, kernel_size=3, padding=1, dtype=self.dtype
        )
        if self.slim:
            conv2 = TorchConv3d(self.channels, kernel_size=1, dtype=self.dtype)
        else:
            conv2 = TorchConv3d(
                self.channels, kernel_size=3, padding=1, dtype=self.dtype
            )
        on_tpu = _running_on_tpu()
        fused = self.use_fused if self.use_fused is not None else on_tpu
        if self.use_fused is None:
            # auto mode only fuses at the measured-win scale; an
            # explicit True bypasses the size heuristic (tests, probes)
            n_vox = 1
            for s in x.shape[1:4]:
                n_vox *= s
            fused = fused and n_vox >= _FUSED_MIN_VOXELS
        # under nn.remat `deterministic` may be a traced bool — only a
        # static Python True can waive the dropout==0 requirement
        no_dropout = self.dropout == 0.0 or (
            isinstance(deterministic, bool) and deterministic
        )
        fused = (
            fused
            and self.slim
            and no_dropout
            and x.shape[-1] == self.channels
            and supports_fused_residual(x.shape, self.res_channels)
        )
        if fused:
            w1, b1 = conv1(x, params_only=True)
            w2, b2 = conv2(
                jnp.zeros((1, 1, 1, 1, self.res_channels), self.dtype),
                params_only=True,
            )
            return fused_residual_layer(
                x.astype(self.dtype), w1, b1,
                w2.reshape(self.res_channels, self.channels), b2,
                not on_tpu,  # interpret mode when forced on off-TPU
            )
        h = conv1(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv2(h)
        return nn.relu(x + h)


class BaselineVQVAE(nn.Module):
    """See module docstring.  Inputs/outputs are channels-last
    ``(B, D, H, W, 1)`` volumes."""

    n_levels: int = 3
    downsample_parameters: Tuple[Tuple[int, int, int, int], ...] = (
        (4, 2, 1, 1),
        (4, 2, 1, 1),
        (4, 2, 1, 1),
    )
    upsample_parameters: Tuple[Tuple[int, int, int, int, int], ...] = (
        (4, 2, 1, 0, 1),
        (4, 2, 1, 0, 1),
        (4, 2, 1, 0, 1),
    )
    n_embed: int = 256
    embed_dim: int = 256
    n_channels: int = 144
    n_res_channels: int = 144
    n_res_layers: int = 3
    dropout: float = 0.0
    use_slim_residual: bool = True
    use_subpixel_conv: bool = False
    embedding_init: str = "normal"
    dtype: Any = jnp.bfloat16
    use_pallas_vq: Optional[bool] = None
    # None = auto: fused residual-layer Pallas kernel on TPU when the
    # shape gate passes (ops/res_stack_pallas.py); False forces XLA
    use_fused_residual: Optional[bool] = None
    # rematerialize residual stacks in the backward pass — the
    # TPU-idiomatic memory/FLOP trade that lets full 160×224×160
    # volumes train in 16 GB HBM (SURVEY.md §2.9 AMP row: no GradScaler
    # tricks, just jax.checkpoint)
    use_remat: bool = False

    def setup(self):
        res_layer = (
            nn.remat(ResidualLayer, static_argnums=())
            if self.use_remat
            else ResidualLayer
        )
        # measured auto-policy (BASELINE.md round 5): the fused kernel
        # wins 1.18x under REMAT training (the backward recompute runs
        # at isolated-kernel cost, where the kernel beats XLA), but
        # loses in plain forward/no-remat graphs where XLA fuses the
        # conv chain with its neighbours — so auto only fuses the
        # rematerialized training form; explicit True/False overrides
        if self.use_fused_residual is None:
            layer_fused = None if self.use_remat else False
        else:
            layer_fused = self.use_fused_residual
        # ---- encoder (reference construct_encoder, baseline.py:213-246)
        enc_convs, enc_res = [], []
        for i in range(self.n_levels):
            k, s, p, dil = self.downsample_parameters[i]
            ch = self._level_channels(i)
            enc_convs.append(
                TorchConv3d(
                    ch, kernel_size=k, stride=s, padding=p, dilation=dil,
                    dtype=self.dtype, name=f"encoder_conv_{i}",
                )
            )
            res_ch = self.n_res_channels // (1 if i == self.n_levels - 1 else 2)
            enc_res.append(
                [
                    res_layer(
                        ch, res_ch, self.dropout, slim=self.use_slim_residual,
                        dtype=self.dtype, use_fused=layer_fused,
                        name=f"encoder_res_{i}_{j}",
                    )
                    for j in range(self.n_res_layers)
                ]
            )
        self.encoder_convs = enc_convs
        self.encoder_res = enc_res
        self.encoder_out_conv = TorchConv3d(
            self.embed_dim, kernel_size=3, padding=1, dtype=self.dtype,
            name="encoder_out_conv",
        )

        # ---- decoder (reference construct_decoder, baseline.py:257-299)
        self.decoder_in_conv = TorchConv3d(
            self.n_channels, kernel_size=3, padding=1, dtype=self.dtype,
            name="decoder_in_conv",
        )
        dec_res, dec_ups = [], []
        for i in range(self.n_levels):
            ch = self.n_channels // (1 if i == 0 else 2)
            res_ch = self.n_res_channels // (1 if i == 0 else 2)
            dec_res.append(
                [
                    res_layer(
                        ch, res_ch, self.dropout, slim=self.use_slim_residual,
                        dtype=self.dtype, use_fused=layer_fused,
                        name=f"decoder_res_{i}_{j}",
                    )
                    for j in range(self.n_res_layers)
                ]
            )
            last = i == self.n_levels - 1
            k, s, p, op, dil = self.upsample_parameters[i]
            out_ch = 1 if last else self.n_channels // 2
            if last and self.use_subpixel_conv:
                dec_ups.append(
                    SubpixelUpsample3d(
                        out_ch, scale=s, dtype=self.dtype, name="decoder_subpixel"
                    )
                )
            else:
                dec_ups.append(
                    TorchConvTranspose3d(
                        out_ch, kernel_size=k, stride=s, padding=p,
                        output_padding=op, dilation=dil, dtype=self.dtype,
                        name=f"decoder_up_{i}",
                    )
                )
        self.decoder_res = dec_res
        self.decoder_ups = dec_ups

        # ---- EMA codebook as explicit functional state
        def _init_vq():
            key = (
                self.make_rng("params")
                if self.has_rng("params")
                else jax.random.key(0)
            )
            return vq_ops.init_vq_state(
                key, self.n_embed, self.embed_dim, self.embedding_init
            )

        self.vq_state = self.variable("vq", "level_0", _init_vq)

    def _level_channels(self, i: int) -> int:
        # encoder level output channels: C for the deepest level, C/2 above
        return self.n_channels // (1 if i == self.n_levels - 1 else 2)

    # ------------------------------------------------------------------
    # public ops (ABC parity)
    # ------------------------------------------------------------------

    def encode(self, images: jax.Array, *, deterministic: bool = True) -> List[jax.Array]:
        x = images.astype(self.dtype)
        for i in range(self.n_levels):
            x = self.encoder_convs[i](x)
            x = nn.relu(x)
            for res in self.encoder_res[i]:
                x = res(x, deterministic=deterministic)
        return [self.encoder_out_conv(x)]

    def quantize(
        self,
        encodings: List[jax.Array],
        *,
        decay: float = 0.5,
        commitment_cost: float = 0.25,
        training: bool = False,
        axis_name: Optional[str] = None,
    ) -> Tuple[List[jax.Array], List[jax.Array], List[jax.Array]]:
        """Returns ``([quantized_st], [losses], [indices])``; updates the
        EMA codebook state when ``training``."""
        q, loss, idx, new_state = vq_ops.quantize_ema(
            self.vq_state.value,
            encodings[0],
            decay=decay,
            commitment_cost=commitment_cost,
            training=training,
            use_pallas=self.use_pallas_vq,
            axis_name=axis_name,
        )
        if training and not self.is_initializing():
            self.vq_state.value = new_state
        self.sow(
            "diagnostics", "perplexity",
            vq_ops.perplexity(idx, self.n_embed),
            reduce_fn=lambda _, b: b,
        )
        return [q.astype(self.dtype)], [loss], [idx]

    def decode(self, quantizations: List[jax.Array], *, deterministic: bool = True) -> jax.Array:
        x = self.decoder_in_conv(quantizations[0].astype(self.dtype))
        for i in range(self.n_levels):
            for res in self.decoder_res[i]:
                x = res(x, deterministic=deterministic)
            if i == self.n_levels - 1 and not deterministic:
                # expose the final layer's input so the adaptive
                # adversarial weight (reference trainer.py:269-294:
                # ‖∇_last recon‖/‖∇_last gen‖) can be computed from a
                # head-only vjp instead of two full backward passes —
                # the grads w.r.t. the last kernel never flow through
                # the rest of the network, so fixing x here is exact
                self.sow(
                    "diagnostics", "last_layer_input", x,
                    reduce_fn=lambda _, b: b,
                )
            x = self.decoder_ups[i](x)
            if i != self.n_levels - 1:
                x = nn.relu(x)
        # no output activation (reference baseline.py:295)
        return x

    def index_quantize(self, images: jax.Array) -> List[jax.Array]:
        """encode → nearest-codeword indices (the 'extracting' path,
        reference baseline.py:342-346)."""
        enc = self.encode(images, deterministic=True)[0]
        flat = jnp.asarray(enc, jnp.float32).reshape(-1, self.embed_dim)
        idx = vq_ops.nearest_codeword(
            flat, self.vq_state.value.codebook, use_pallas=self.use_pallas_vq
        )
        return [idx.reshape(enc.shape[:-1])]

    def decode_samples(self, embedding_indices: List[jax.Array]) -> jax.Array:
        """indices → embed → decode (the 'decoding'/sampling path,
        reference baseline.py:348-352)."""
        codes = vq_ops.embed_indices(self.vq_state.value, embedding_indices[0])
        return self.decode([codes.astype(self.dtype)], deterministic=True)

    def __call__(
        self,
        images: jax.Array,
        *,
        decay: float = 0.5,
        commitment_cost: float = 0.25,
        training: bool = False,
        axis_name: Optional[str] = None,
    ) -> Dict[str, List[jax.Array]]:
        enc = self.encode(images, deterministic=not training)
        q, losses, _ = self.quantize(
            enc,
            decay=decay,
            commitment_cost=commitment_cost,
            training=training,
            axis_name=axis_name,
        )
        recon = self.decode(q, deterministic=not training)
        return {"reconstruction": [recon], "quantization_losses": losses}

    def last_layer_name(self) -> str:
        """Name of the final decoder submodule — its kernel is the
        reference's ``get_last_layer`` (baseline.py:139), used for the
        adaptive adversarial weight."""
        if self.use_subpixel_conv:
            return "decoder_subpixel"
        return f"decoder_up_{self.n_levels - 1}"
