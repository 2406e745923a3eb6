"""3D PatchGAN discriminator (pix2pix-style).

Rebuild of the reference ``BaselineDiscriminator``
(src/networks/discriminator/baseline.py:21-88): Conv3d(k4,s2,p1) →
LeakyReLU(0.2), ``n_layers`` blocks doubling filters (ndf base, capped
at 8×) with BatchNorm, a stride-1 block, and a final 1-channel patch
map; DCGAN N(0, 0.02) conv init / N(1, 0.02) norm-scale init
(baseline.py:12-18).  Channels-last, bf16 compute, fp32 batch-norm
statistics (the ``batch_stats`` collection).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from synthanatomy_tpu.models.vqvae import TorchConv3d

__all__ = ["BaselineDiscriminator"]

_dcgan_conv_init = nn.initializers.normal(stddev=0.02)


class _DCGANConv3d(TorchConv3d):
    """TorchConv3d with DCGAN N(0, 0.02) kernel init."""

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            _dcgan_conv_init,
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        from synthanatomy_tpu.ops.conv3d import conv3d

        x = x.astype(self.dtype)
        return conv3d(
            x,
            kernel.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            bias=None if bias is None else bias.astype(self.dtype),
        )


_bn_scale_init = lambda key, shape, dtype=jnp.float32: 1.0 + 0.02 * jax.random.normal(  # noqa: E731
    key, shape, dtype
)


class SplitBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are computed per batch
    GROUP — the exact semantics of running the same layer over each
    group in sequence (the reference's D(fake) then D(real) forwards,
    trainer.py:219-256), but from ONE concatenated activation stream.

    With ``groups=1`` this is plain batch norm.  With ``groups=g`` the
    batch axis is split into g equal contiguous chunks; each chunk is
    normalized by its own mean/var, and the running statistics receive
    the g per-chunk updates sequentially in chunk order — bitwise the
    same running-average recurrence as g separate train-mode forwards.
    Parameter / variable names match ``nn.BatchNorm`` ("scale"/"bias",
    batch_stats "mean"/"var"), so checkpoints are interchangeable.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, training: bool, groups: int = 1):
        C = x.shape[-1]
        scale = self.param("scale", _bn_scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        if not training:
            mean, var = ra_mean.value, ra_var.value
            xf = x.astype(jnp.float32)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
            return y.astype(self.dtype)

        B = x.shape[0]
        assert B % groups == 0, (B, groups)
        xg = x.astype(jnp.float32).reshape((groups, B // groups) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))  # per-group batch+spatial
        mean = jnp.mean(xg, axis=axes)  # (groups, C)
        var = jnp.mean(jnp.square(xg), axis=axes) - jnp.square(mean)
        inv = jax.lax.rsqrt(var + self.epsilon)
        shp = (groups,) + (1,) * (xg.ndim - 2) + (C,)
        y = (xg - mean.reshape(shp)) * inv.reshape(shp) * scale + bias
        if not self.is_initializing():
            m, rm, rv = self.momentum, ra_mean.value, ra_var.value
            for g in range(groups):  # sequential, chunk order
                rm = m * rm + (1 - m) * mean[g]
                rv = m * rv + (1 - m) * var[g]
            ra_mean.value, ra_var.value = rm, rv
        return y.reshape(x.shape).astype(self.dtype)


class BaselineDiscriminator(nn.Module):
    input_nc: int = 1  # factory hardcodes 1/64/3 (configure.py:7-20)
    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.bfloat16
    # grouped-stat BN opt-in (VERDICT r4 #5): lets the train step run
    # D(fake)+D(real) as ONE conv pass over the concatenated batch while
    # reproducing the per-forward BatchNorm statistics exactly (see
    # SplitBatchNorm).  Parameter/stat layout is unchanged.
    use_split_bn: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, *, training: bool = False, stat_groups: int = 1
    ) -> jax.Array:
        """x: (B, D, H, W, input_nc) → patch logits
        (B, D', H', W', 1).  ``stat_groups>1`` (requires
        ``use_split_bn``) computes train-mode BN statistics per batch
        group — the one-pass fake+real variant."""
        if stat_groups > 1 and not self.use_split_bn:
            raise ValueError("stat_groups>1 requires use_split_bn=True")

        def bn(h, name):
            if self.use_split_bn:
                return SplitBatchNorm(
                    momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
                )(h, training=training, groups=stat_groups if training else 1)
            # torch BatchNorm init is scale ≈ N(1, 0.02)
            layer = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                scale_init=_bn_scale_init,
                name=name,
            )
            return layer(h)

        h = _DCGANConv3d(
            self.ndf, kernel_size=4, stride=2, padding=1, dtype=self.dtype,
            name="conv_0",
        )(x)
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = _DCGANConv3d(
                self.ndf * nf_mult, kernel_size=4, stride=2, padding=1,
                use_bias=False, dtype=self.dtype, name=f"conv_{n}",
            )(h)
            h = bn(h, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2**self.n_layers, 8)
        h = _DCGANConv3d(
            self.ndf * nf_mult, kernel_size=4, stride=1, padding=1,
            use_bias=False, dtype=self.dtype, name=f"conv_{self.n_layers}",
        )(h)
        h = bn(h, f"norm_{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)

        h = _DCGANConv3d(
            1, kernel_size=4, stride=1, padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)
        if 0 in h.shape:
            # torch raises "Output size is too small" here; XLA happily
            # emits a zero-sized array whose mean is a silent NaN that
            # poisons every adversarial loss — fail loudly instead
            raise ValueError(
                f"discriminator patch map is empty ({h.shape}) — input "
                f"spatial dims {tuple(x.shape[1:4])} are too small for "
                f"{self.n_layers} stride-2 k4 levels; use inputs of at "
                "least ~(24, 24, 24) or fewer levels"
            )
        return h
