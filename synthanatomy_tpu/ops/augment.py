"""Device-side (jitted) volume augmentation.

TPU-native replacement for the hot part of the host transform chain
(reference MONAI pipeline, src/utils/vqvae.py:183-371): the random
affine is a trilinear gather and the photometric ops are elementwise —
both are cheap, fused XLA work on-chip, while the host's
single-threaded ``scipy.ndimage.affine_transform`` on a 160×224×160
fp32 volume costs ~1 s/volume and starves the chip (BASELINE.md host
pipeline measurement).

Split of responsibilities (keeps the reference's per-sample trace and
rng-stream contract):

- HOST (data/transforms.py ``VQVAETransform.draw_device_params``):
  draws the fire decisions and transform parameters from the same
  per-sample ``np.random.Generator`` stream as the host path, so the
  transformations-trace CSV and determinism guarantees are unchanged.
- DEVICE (this module): applies them — affine resample (order-1,
  zero-padded, matching ``scipy.ndimage.affine_transform``), gamma
  contrast, intensity shift, gaussian noise, clamp to [0, 1].

Every transform is computed unconditionally and selected by its fire
flag (a ``where`` — XLA has no cheap per-sample dynamic control flow,
and the whole chain costs a few ms/volume on-chip).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["affine_resample", "augment_batch", "make_augment_fn"]


def affine_resample(
    x: jax.Array, matrix: jax.Array, offset: jax.Array
) -> jax.Array:
    """Trilinear resample of a (D, H, W) volume under an output→input
    affine map: ``out[o] = interp(x, matrix @ o + offset)``, zero
    outside — the semantics of ``scipy.ndimage.affine_transform(x,
    matrix, offset, order=1, mode="constant", cval=0)`` with
    output_shape == x.shape."""
    D, H, W = x.shape
    ii = jnp.arange(D, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    kk = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    m = matrix.astype(jnp.float32)
    off = offset.astype(jnp.float32)
    cd = m[0, 0] * ii + m[0, 1] * jj + m[0, 2] * kk + off[0]
    ch = m[1, 0] * ii + m[1, 1] * jj + m[1, 2] * kk + off[1]
    cw = m[2, 0] * ii + m[2, 1] * jj + m[2, 2] * kk + off[2]

    f = x.reshape(-1)

    def corner(d0, h0, w0):
        # indices are clamped; out-of-domain output voxels are masked
        # wholesale below (scipy semantics), so no per-corner mask
        dc = jnp.clip(d0, 0, D - 1)
        hc = jnp.clip(h0, 0, H - 1)
        wc = jnp.clip(w0, 0, W - 1)
        lin = (dc * H + hc) * W + wc
        return jnp.take(f, lin.reshape(-1)).reshape(d0.shape)

    d0 = jnp.floor(cd).astype(jnp.int32)
    h0 = jnp.floor(ch).astype(jnp.int32)
    w0 = jnp.floor(cw).astype(jnp.int32)
    wd = cd - d0
    wh = ch - h0
    ww = cw - w0

    out = jnp.zeros((D, H, W), jnp.float32)
    for dd in (0, 1):
        for hh in (0, 1):
            for wwc in (0, 1):
                wgt = (
                    (wd if dd else 1.0 - wd)
                    * (wh if hh else 1.0 - wh)
                    * (ww if wwc else 1.0 - ww)
                )
                out = out + wgt * corner(d0 + dd, h0 + hh, w0 + wwc)
    # scipy mode="constant" yields cval for ANY sample point outside
    # the input domain [0, size-1] — no partial blending at the edge
    inside = (
        (cd >= 0) & (cd <= D - 1)
        & (ch >= 0) & (ch <= H - 1)
        & (cw >= 0) & (cw <= W - 1)
    )
    return jnp.where(inside, out, 0.0)


def _augment_one(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """One (D, H, W) float32 volume through the randomized chain with
    pre-drawn parameters (see ``VQVAETransform.draw_device_params``)."""
    x = x.astype(jnp.float32)
    # RandAffined
    y = affine_resample(x, p["matrix"], p["offset"])
    x = jnp.where(p["affine_fired"], y, x)
    # RandAdjustContrastd (host: ((x-mn)/max(range,eps))**gamma * ... )
    eps = 1e-7
    mn = jnp.min(x)
    rngv = jnp.maximum(jnp.max(x) - mn, eps)
    xg = ((x - mn) / rngv) ** p["gamma"] * rngv + mn
    x = jnp.where(p["contrast_fired"], xg, x)
    # RandShiftIntensityd
    x = x + p["shift"] * p["shift_fired"].astype(jnp.float32)
    # RandGaussianNoised — device stream seeded per-sample from the
    # host rng (the one intentional divergence from the host path: the
    # noise VALUES come from a different generator; distribution and
    # determinism-given-seed are preserved)
    noise = p["noise_std"] * jax.random.normal(
        jax.random.PRNGKey(p["noise_seed"]), x.shape, jnp.float32
    )
    x = x + noise * p["noise_fired"].astype(jnp.float32)
    # the two ThresholdIntensityd clamps (vqvae.py:357-359)
    return jnp.clip(x, 0.0, 1.0)


def augment_batch(batch: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
    """(B, D, H, W[, 1]) batch → augmented batch, same shape/dtype
    contract as the host chain output (float32 in [0, 1])."""
    squeeze = batch.ndim == 5
    x = batch[..., 0] if squeeze else batch
    out = jax.vmap(_augment_one)(x.astype(jnp.float32), params)
    return out[..., None] if squeeze else out


def make_augment_fn():
    """A jittable ``(batch, params) -> batch`` for composing with a
    train step inside one jit (single device dispatch)."""
    return augment_batch
