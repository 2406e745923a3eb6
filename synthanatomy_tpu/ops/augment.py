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

__all__ = [
    "affine_resample",
    "affine_resample_shear",
    "shear_shift_bounds",
    "augment_batch",
    "make_augment_fn",
]


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


# ---------------------------------------------------------------------------
# fast path: 3-pass (Catmull–Smith) resampling
#
# TPUs have no hardware vector gather — the trilinear 8-corner gather
# above lowers to a serial XLA gather loop (~540 ms/volume measured,
# BASELINE.md).  The classic alternative decomposes the affine into
# three single-axis resampling passes; along one axis the sample
# position is LINEAR in the coordinates, so each pass is a small static
# set of shifted slices blended with per-voxel weights — pure
# streaming/VPU work XLA executes at memory bandwidth.  The price is
# three chained linear interpolations instead of one trilinear (a
# standard, slightly smoother approximation — NOT bit-equal to scipy).
# ---------------------------------------------------------------------------


def _pass_coeffs(m: jax.Array, off: jax.Array):
    """Per-pass linear sample-position coefficients for the 3-pass
    decomposition of ``in_coord = m @ out_coord + off``.

    Pass application order: axis 0 first, then axis 1, then axis 2
    (``y3[i,j,k] = x[phi0(i, phi1(i,j,phi2), phi2), phi1(i,j,phi2),
    phi2(i,j,k)]``).  Each phi is linear; rows returned as (a_i, a_j,
    a_k, const) giving the sample position along that pass's axis as a
    function of the pass-input coordinates."""
    m = m.astype(jnp.float32)
    off = off.astype(jnp.float32)
    # pass 3 (axis 2, applied last): position = row 2 of (m, off)
    p2 = (m[2, 0], m[2, 1], m[2, 2], off[2])
    # pass 2 (axis 1): phi1(i, j, z) with z = c2 already resampled
    r = m[1, 2] / m[2, 2]
    p1 = (
        m[1, 0] - r * m[2, 0],
        m[1, 1] - r * m[2, 1],
        r,
        off[1] - r * off[2],
    )
    # pass 1 (axis 0): phi0(i, y, z) solving (j,k) from (y,z)=(c1,c2)
    det = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
    b01 = (m[0, 1] * m[2, 2] - m[0, 2] * m[2, 1]) / det
    b02 = (m[0, 2] * m[1, 1] - m[0, 1] * m[1, 2]) / det
    p0 = (
        m[0, 0] - b01 * m[1, 0] - b02 * m[2, 0],
        b01,
        b02,
        off[0] - b01 * off[1] - b02 * off[2],
    )
    return p0, p1, p2


def shear_shift_bounds(
    shape, *, rotate_range: float, translate_range: float,
    scale_range: float, safety: int = 2,
) -> tuple:
    """Static per-pass integer shift bounds for ``affine_resample_shear``.

    Evaluated on the host over the extreme corners of the parameter box
    (each angle in {-r, 0, r}, each scale in {1-s, 1+s}, translation at
    extremes), so one bound covers every sample a training run can draw
    — jit shapes stay static."""
    import itertools

    import numpy as np  # noqa: F811 (host math)

    D, H, W = shape
    best = [0, 0, 0]
    angs = (-rotate_range, 0.0, rotate_range)
    scls = (1.0 - scale_range, 1.0 + scale_range)
    for a0, a1, a2 in itertools.product(angs, angs, angs):
        def rot(axis, a):
            c, s = np.cos(a), np.sin(a)
            mm = np.eye(3)
            i, j = [k for k in range(3) if k != axis]
            mm[i, i], mm[i, j], mm[j, i], mm[j, j] = c, -s, s, c
            return mm

        R = rot(0, a0) @ rot(1, a1) @ rot(2, a2)
        for s0, s1, s2 in itertools.product(scls, scls, scls):
            M = R @ np.diag((s0, s1, s2))
            c_in = (np.asarray(shape) - 1) / 2.0
            # the center shift's sign is DETERMINED by M (offset =
            # c_in - M·c_in - trans) — keep it exact and enumerate only
            # the free translation signs, or the bound loses the
            # center/corner cancellation and inflates ~2.7×
            center = c_in - M @ c_in
            exts = (D - 1, H - 1, W - 1)
            for sg in itertools.product((-1.0, 1.0), repeat=3):
                off_vec = center - np.asarray(sg) * translate_range
                # _pass_coeffs is backend-agnostic (jnp.float32 IS
                # np.float32); numpy in → numpy out, no device ops here
                coeffs = _pass_coeffs(
                    np.asarray(M, np.float32),
                    np.asarray(off_vec, np.float32),
                )
                for axis, (ai, aj, ak, cc) in enumerate(coeffs):
                    ai, aj, ak, cc = map(float, (ai, aj, ak, cc))
                    own = (ai, aj, ak)[axis]
                    others = [
                        v for n, v in enumerate((ai, aj, ak)) if n != axis
                    ]
                    oexts = [e for n, e in enumerate(exts) if n != axis]
                    # |position - own coord| is linear over the
                    # coordinate box → exact extreme is at a corner
                    # (center shifts in cc cancel most of the corner
                    # deviation; an abs-sum bound would be ~2× looser)
                    dev = max(
                        abs((own - 1.0) * e0 + others[0] * e1
                            + others[1] * e2 + cc)
                        for e0 in (0.0, float(exts[axis]))
                        for e1 in (0.0, float(oexts[0]))
                        for e2 in (0.0, float(oexts[1]))
                    )
                    best[axis] = max(best[axis], int(np.ceil(dev)) + safety)
    return tuple(best)


def _resample_axis(x, axis, coeffs, max_shift):
    """One pass: resample ``x`` along ``axis`` at positions
    ``a_i*i + a_j*j + a_k*k + c`` (linear interp, zero outside)."""
    ai, aj, ak, c = coeffs
    D, H, W = x.shape
    ii = jnp.arange(D, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    kk = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    p = ai * ii + aj * jj + ak * kk + c
    own = (ii, jj, kk)[axis]
    n = jnp.floor(p)
    f = p - n
    rel = (n - own).astype(jnp.int32)  # integer shift per voxel

    npad = max_shift + 1
    pad = [(0, 0)] * 3
    pad[axis] = (npad, npad)
    xp = jnp.pad(x, pad)
    size = x.shape[axis]

    out = jnp.zeros_like(x)
    for s in range(-max_shift, max_shift + 2):
        # contribution of x[own + s]: corner n (weight 1-f) when
        # rel == s, corner n+1 (weight f) when rel == s - 1
        w = jnp.where(rel == s, 1.0 - f, 0.0) + jnp.where(rel == s - 1, f, 0.0)
        sl = jax.lax.slice_in_dim(xp, npad + s, npad + s + size, axis=axis)
        out = out + w * sl
    # zero where the sample position leaves the input domain (scipy
    # mode="constant" semantics, applied per pass)
    inside = (p >= 0) & (p <= size - 1)
    return jnp.where(inside, out, 0.0)


def affine_resample_shear(
    x: jax.Array, matrix: jax.Array, offset: jax.Array, max_shifts,
) -> jax.Array:
    """3-pass resample of a (D, H, W) volume under the output→input
    affine map — the TPU-fast approximation of ``affine_resample``
    (multi-pass linear interpolation; interior values agree with the
    trilinear gather to ~1e-2 on smooth volumes, see tests).

    ``max_shifts`` is the static (per-pass) integer shift bound from
    :func:`shear_shift_bounds` — it must cover every parameter draw of
    the run, or edge voxels silently clip to 0 (the bound is
    worst-cased over the parameter box, so this cannot happen for
    in-range draws)."""
    p0, p1, p2 = _pass_coeffs(matrix, offset)
    y = _resample_axis(x.astype(jnp.float32), 0, p0, int(max_shifts[0]))
    y = _resample_axis(y, 1, p1, int(max_shifts[1]))
    return _resample_axis(y, 2, p2, int(max_shifts[2]))


def _augment_one(
    x: jax.Array, p: Dict[str, jax.Array], max_shifts=None
) -> jax.Array:
    """One (D, H, W) float32 volume through the randomized chain with
    pre-drawn parameters (see ``VQVAETransform.draw_device_params``).

    ``max_shifts`` (static) selects the fast 3-pass affine; None uses
    the exact-trilinear gather (slow on TPU — BASELINE.md)."""
    x = x.astype(jnp.float32)
    # RandAffined
    if max_shifts is not None:
        y = affine_resample_shear(x, p["matrix"], p["offset"], max_shifts)
    else:
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


def augment_batch(
    batch: jax.Array, params: Dict[str, jax.Array], max_shifts=None
) -> jax.Array:
    """(B, D, H, W[, 1]) batch → augmented batch, same shape/dtype
    contract as the host chain output (float32 in [0, 1]).

    ``max_shifts`` (static 3-tuple from :func:`shear_shift_bounds`)
    selects the TPU-fast 3-pass affine; None keeps the exact-trilinear
    gather."""
    squeeze = batch.ndim == 5
    x = batch[..., 0] if squeeze else batch
    out = jax.vmap(lambda v, q: _augment_one(v, q, max_shifts))(
        x.astype(jnp.float32), params
    )
    return out[..., None] if squeeze else out


def make_augment_fn():
    """A jittable ``(batch, params) -> batch`` for composing with a
    train step inside one jit (single device dispatch)."""
    return augment_batch
