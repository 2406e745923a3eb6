"""Stage-1 reconstruction losses (pure functions, fp32).

Rebuild of the reference's 10-loss suite
(src/losses/vqvae/vqvae.py, registry src/losses/vqvae/utils.py:4-15,
factory src/losses/vqvae/configure.py:22-53).  Shared contract kept:
every loss takes the network-output dict
(``{"reconstruction": [x], "quantization_losses": [l]}``) plus the
target, always adds the commitment losses, and returns
``(total_loss, summaries)`` where ``summaries`` uses the reference's
TensorBoard scalar names — the functional replacement for the
reference's ``self.summaries`` side channel.

Scheduled factors (``gdl_factor``, ``fft_factor``, …) are call-time
scalars: feed them from the param schedulers into the jitted step
(the reference mutates them on the loss object via
ParamSchedulerHandler).

Layout: channels-last (B, D, H, W, 1) volumes.  FFTs run over the
(D, H, W, C) axes with ortho norm — identical math to the reference's
dims (1..4) of NCDHW since the channel axis has size 1 and a size-1
FFT is the identity.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthanatomy_tpu.losses.lpips import lpips_distance

__all__ = [
    "VQVAE_LOSS_NAMES",
    "get_vqvae_loss",
    "mse_loss",
    "baur_loss",
    "spectral_loss",
    "hartley_loss",
    "jukebox_loss",
    "wavegan_loss",
    "perceptual_loss",
    "jukebox_perceptual_loss",
    "hartley_perceptual_loss",
    "baseline_loss",
]

Summaries = Dict[str, jax.Array]
LossResult = Tuple[jax.Array, Summaries]

VQVAE_LOSS_NAMES = (
    "baur",
    "mse",
    "spectral",
    "hartley",
    "jukebox",
    "wavegan",
    "perceptual",
    "jukebox_perceptual",
    "hartley_perceptual",
    "baseline",
)

_FFT_AXES = (1, 2, 3, 4)


def _unpack(network_output, y):
    y = jnp.asarray(y, jnp.float32)
    y_pred = jnp.asarray(network_output["reconstruction"][0], jnp.float32)
    q_losses = [jnp.asarray(q, jnp.float32) for q in network_output["quantization_losses"]]
    return y_pred, y, q_losses


def _add_q_losses(loss, q_losses, summaries):
    for idx, q in enumerate(q_losses):
        summaries[f"Loss-MSE-VQ{idx}_Commitment_Cost"] = q
        loss = loss + q
    return loss


def _fft_amplitude(x):
    f = jnp.fft.fftn(x, axes=_FFT_AXES, norm="ortho")
    return jnp.sqrt(f.real**2 + f.imag**2)


# ---------------------------------------------------------------------------


def mse_loss(network_output, y) -> LossResult:
    """reference MSELoss (vqvae.py:14-71)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}
    loss = jnp.mean(jnp.square(y_pred - y))
    s["Loss-MSE-Reconstruction"] = loss
    return _add_q_losses(loss, q_losses, s), s


def baur_loss(network_output, y, *, gdl_factor: jax.Array = 0.0) -> LossResult:
    """L1 + L2 + image-gradient-difference loss with scheduled
    ``gdl_factor`` (reference BaurLoss, vqvae.py:74-185; GDL per
    Mathieu et al. 2016).  Gradients are forward differences along
    each spatial axis, compared on the interior voxels."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}

    l1 = jnp.mean(jnp.abs(y_pred - y))
    s["Loss-MAE-Reconstruction"] = l1
    l2 = jnp.mean(jnp.square(y_pred - y))
    s["Loss-MSE-Reconstruction"] = l2

    def grad_mag(v, axis):
        # |shift(v) - v| on the interior, mirroring the reference's
        # ConstantPad3d((1,-1)) shift then [1:-1] crop
        shifted = jnp.pad(
            v,
            [(0, 0)] + [(1, 0) if a == axis else (0, 0) for a in (1, 2, 3)] + [(0, 0)],
        )
        shifted = jax.lax.slice_in_dim(shifted, 0, v.shape[axis], axis=axis)
        d = jnp.abs(shifted - v)
        return d[:, 1:-1, 1:-1, 1:-1, :]

    # the reference sums the three axis terms elementwise, then reduces
    gdl_elem = None
    for axis in (1, 2, 3):
        term = jnp.abs(grad_mag(y, axis) - grad_mag(y_pred, axis))
        gdl_elem = term if gdl_elem is None else gdl_elem + term
    gdl = jnp.mean(gdl_elem) * gdl_factor
    s["Loss-GDL-Reconstruction"] = gdl
    s["Auxiliary-GDL_Factor"] = jnp.asarray(gdl_factor, jnp.float32)

    loss = l1 + l2 + gdl
    return _add_q_losses(loss, q_losses, s), s


def spectral_loss(
    network_output, y, *, fft_factor: jax.Array = 1.0, include_pixel_loss: bool = True
) -> LossResult:
    """½·MSE(FFT amplitude) + phase term ``mean(½|1-exp|Δφ||²)``
    (reference SpectralLoss, vqvae.py:188-323; Takaki et al. 2019)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}

    fy = jnp.fft.fftn(y, axes=_FFT_AXES, norm="ortho")
    fp = jnp.fft.fftn(y_pred, axes=_FFT_AXES, norm="ortho")
    amp_y = jnp.sqrt(fy.real**2 + fy.imag**2)
    amp_p = jnp.sqrt(fp.real**2 + fp.imag**2)
    ph_y = jnp.arctan2(fy.imag, fy.real)
    ph_p = jnp.arctan2(fp.imag, fp.real)

    amplitude_loss = 0.5 * jnp.mean(jnp.square(amp_p - amp_y))
    s["Loss-Amplitude-Reconstruction"] = amplitude_loss
    phase_loss = jnp.mean(0.5 * jnp.abs((1 - jnp.exp(jnp.abs(ph_p - ph_y))) ** 2))
    s["Loss-Phase-Reconstruction"] = phase_loss

    fft_loss = (amplitude_loss + phase_loss) * fft_factor
    s["Loss-Spectral-Reconstruction"] = fft_loss
    s["Auxiliary-FFT_Factor"] = jnp.asarray(fft_factor, jnp.float32)

    loss = fft_loss
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


@functools.lru_cache(maxsize=8)
def _hartley_weight(shape: Tuple[int, int, int]) -> np.ndarray:
    """exp of normalized squared distance from the DC-centred grid,
    min-max normalized + 1e-4 (reference vqvae.py:451-508)."""
    mx, my, mz = shape

    def f(x, y, z):
        return (
            (np.abs(mx / 2 - x) / (mx / 2)) ** 2
            + (np.abs(my / 2 - y) / (my / 2)) ** 2
            + (np.abs(mz / 2 - z) / (mz / 2)) ** 2
        )

    w = np.fromfunction(f, shape, dtype=np.float64)
    w = np.exp(w)
    w = w - w.min()
    w = w / w.max()
    return (w + 1e-4).astype(np.float32)


def hartley_loss(
    network_output,
    y,
    *,
    fht_factor: jax.Array = 1.0,
    include_pixel_loss: bool = True,
    prioritise_high_frequency: bool = True,
) -> LossResult:
    """½·MSE of the Hartley transform (Re−Im of the FFT) with optional
    high-frequency weighting (reference HartleyLoss, vqvae.py:326-519)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}

    def fht(x):
        f = jnp.fft.fftn(x, axes=_FFT_AXES, norm="ortho")
        return f.real - f.imag

    hy, hp = fht(y), fht(y_pred)
    if prioritise_high_frequency:
        w = jnp.asarray(_hartley_weight(tuple(int(d) for d in y.shape[1:4])))
        w = w[None, :, :, :, None]
        hy = hy * w
        hp = hp * w

    hart = 0.5 * jnp.mean(jnp.square(hp - hy)) * fht_factor
    s["Loss-Hartley-Reconstruction"] = hart
    s["Auxiliary-Hartley_Factor"] = jnp.asarray(fht_factor, jnp.float32)

    loss = hart
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


def jukebox_loss(
    network_output, y, *, fft_factor: jax.Array = 1.0, include_pixel_loss: bool = True
) -> LossResult:
    """MSE of FFT amplitudes — Jukebox L_spec (reference JukeboxLoss,
    vqvae.py:522-638)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}
    spec = jnp.mean(jnp.square(_fft_amplitude(y_pred) - _fft_amplitude(y))) * fft_factor
    s["Loss-Spectral-Reconstruction"] = spec
    s["Auxiliary-FFT_Factor"] = jnp.asarray(fft_factor, jnp.float32)
    loss = spec
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


def wavegan_loss(
    network_output, y, *, fft_factor: jax.Array = 1.0, include_pixel_loss: bool = True
) -> LossResult:
    """Spectral-convergence + log-magnitude L1 (reference WaveGANLoss,
    vqvae.py:641-770; Yamamoto et al. 2020 Eq. 4-5)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}
    amp_y = _fft_amplitude(y)
    amp_p = _fft_amplitude(y_pred)
    l_sc = jnp.linalg.norm((amp_y - amp_p).reshape(-1)) / jnp.linalg.norm(
        amp_y.reshape(-1)
    )
    s["Loss-Spectral_Convergence-Reconstruction"] = l_sc
    l_mag = jnp.mean(jnp.abs(jnp.log(amp_y) - jnp.log(amp_p)))
    s["Loss-Log_Magnitude-Reconstruction"] = l_mag
    spec = (l_sc + l_mag) * fft_factor
    s["Loss-Spectral-Reconstruction"] = spec
    s["Auxiliary-FFT_Factor"] = jnp.asarray(fft_factor, jnp.float32)
    loss = spec
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


# ---------------------------------------------------------------------------
# 2.5D perceptual machinery
# ---------------------------------------------------------------------------

# channels-last views batchifying one spatial axis each; equivalents of
# the reference's fake_3D_views permutations (vqvae.py:854-863) for
# NCDHW axes 2/3/4
_FAKE3D_AXES = (1, 2, 3)


def _batchify_axis(v: jax.Array, axis: int) -> jax.Array:
    """(B, D, H, W, C) → (B·dim_axis, h1, h2, C) treating ``axis`` as
    extra batch."""
    order = [0, axis] + [a for a in (1, 2, 3) if a != axis] + [4]
    vt = jnp.transpose(v, order)
    return vt.reshape((-1,) + vt.shape[2:])


def _fake_3d_lpips(
    lpips_params, y, y_pred, axis, *, keep_ratio: float, rng: Optional[jax.Array]
) -> jax.Array:
    ys = _batchify_axis(y, axis)
    ps = _batchify_axis(y_pred, axis)
    n = ys.shape[0]
    k = max(1, int(n * keep_ratio))
    if rng is not None and k < n:
        idx = jax.random.permutation(rng, n)[:k]
        ys = jnp.take(ys, idx, axis=0)
        ps = jnp.take(ps, idx, axis=0)
    return jnp.mean(lpips_distance(lpips_params, ys, ps, normalize=True))


def perceptual_loss(
    network_output,
    y,
    *,
    lpips_params,
    rng: Optional[jax.Array] = None,
    keep_ratio: float = 0.5,
    perceptual_factor: jax.Array = 0.001,
    include_pixel_loss: bool = True,
) -> LossResult:
    """2.5D LPIPS over the three anatomical axes with random slice drop
    (reference PerceptualLoss, vqvae.py:774-999; factor 0.001,
    drop_ratio 0.5 from the factory)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}
    loss = jnp.zeros(())
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    for i, axis in enumerate(_FAKE3D_AXES):
        p = (
            _fake_3d_lpips(
                lpips_params, y, y_pred, axis, keep_ratio=keep_ratio, rng=rngs[i]
            )
            * perceptual_factor
        )
        s[f"Loss-Perceptual_{i}-Reconstruction"] = p
        loss = loss + p
    s["Auxiliary-Perceptual_Factor"] = jnp.asarray(perceptual_factor, jnp.float32)
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


def jukebox_perceptual_loss(
    network_output,
    y,
    *,
    lpips_params,
    rng: Optional[jax.Array] = None,
    keep_ratio: float = 0.5,
    fft_factor: jax.Array = 1.0,
    perceptual_factor: jax.Array = 0.001,
    include_pixel_loss: bool = True,
) -> LossResult:
    """Jukebox spectral + 2.5D LPIPS + MSE — the paper default
    (reference JukeboxPerceptualLoss, vqvae.py:1003-1284;
    README.md:62)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}
    spec = jnp.mean(jnp.square(_fft_amplitude(y_pred) - _fft_amplitude(y))) * fft_factor
    s["Loss-Spectral-Reconstruction"] = spec
    s["Auxiliary-FFT_Factor"] = jnp.asarray(fft_factor, jnp.float32)
    loss = spec
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    for i, axis in enumerate(_FAKE3D_AXES):
        p = (
            _fake_3d_lpips(
                lpips_params, y, y_pred, axis, keep_ratio=keep_ratio, rng=rngs[i]
            )
            * perceptual_factor
        )
        s[f"Loss-Perceptual_{i}-Reconstruction"] = p
        loss = loss + p
    s["Auxiliary-Perceptual_Factor"] = jnp.asarray(perceptual_factor, jnp.float32)
    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


def hartley_perceptual_loss(
    network_output,
    y,
    *,
    lpips_params,
    rng: Optional[jax.Array] = None,
    keep_ratio: float = 0.5,
    fht_factor: jax.Array = 1.0,
    perceptual_factor: jax.Array = 0.001,
    include_pixel_loss: bool = True,
    prioritise_high_frequency: bool = True,
) -> LossResult:
    """Hartley spectral + 2.5D LPIPS + MSE (reference
    HartleyPerceptualLoss, vqvae.py:1288-1645)."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}

    def fht(x):
        f = jnp.fft.fftn(x, axes=_FFT_AXES, norm="ortho")
        return f.real - f.imag

    hy, hp = fht(y), fht(y_pred)
    if prioritise_high_frequency:
        w = jnp.asarray(_hartley_weight(tuple(int(d) for d in y.shape[1:4])))
        w = w[None, :, :, :, None]
        hy, hp = hy * w, hp * w
    hart = 0.5 * jnp.mean(jnp.square(hp - hy)) * fht_factor
    s["Loss-Hartley-Reconstruction"] = hart
    s["Auxiliary-Hartley_Factor"] = jnp.asarray(fht_factor, jnp.float32)
    loss = hart

    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    for i, axis in enumerate(_FAKE3D_AXES):
        p = (
            _fake_3d_lpips(
                lpips_params, y, y_pred, axis, keep_ratio=keep_ratio, rng=rngs[i]
            )
            * perceptual_factor
        )
        s[f"Loss-Perceptual_{i}-Reconstruction"] = p
        loss = loss + p
    s["Auxiliary-Perceptual_Factor"] = jnp.asarray(perceptual_factor, jnp.float32)

    if include_pixel_loss:
        l2 = jnp.mean(jnp.square(y_pred - y))
        s["Loss-MSE-Reconstruction"] = l2
        loss = loss + l2
    return _add_q_losses(loss, q_losses, s), s


def baseline_loss(
    network_output,
    y,
    *,
    lpips_params,
    rng: Optional[jax.Array] = None,
    n_slices: int = 512,
    pixel_factor: jax.Array = 1.0,
    fft_factor: jax.Array = 1.0,
    perceptual_factor: jax.Array = 0.002,
) -> LossResult:
    """L1 + FFT-abs MSE on (t+1)/2 + SqueezeNet LPIPS over up to 512
    random slices per axis, factor 0.002 (reference BaselineLoss,
    vqvae.py:1648-1781; note it calls LPIPS *without* normalize, i.e.
    inputs interpreted as [-1,1])."""
    y_pred, y, q_losses = _unpack(network_output, y)
    s: Summaries = {}

    l1 = jnp.mean(jnp.abs(y - y_pred)) * pixel_factor
    s["Loss-MAE-Reconstruction"] = l1

    def fft_abs(t):
        return jnp.abs(jnp.fft.fftn((t + 1.0) / 2.0, norm="ortho"))

    spec = jnp.mean(jnp.square(fft_abs(y) - fft_abs(y_pred))) * fft_factor
    s["Loss-Jukebox-Reconstruction"] = spec

    names = ("Sagittal", "Axial", "Coronal")
    # reference order: batchify D (sagittal), then W (axial), then H
    axes = (1, 3, 2)
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    p_total = jnp.zeros(())
    for i, axis in enumerate(axes):
        ys = _batchify_axis(y, axis)
        ps = _batchify_axis(y_pred, axis)
        n = ys.shape[0]
        k = min(n, n_slices)
        if rngs[i] is not None and k < n:
            idx = jax.random.permutation(rngs[i], n)[:k]
            ys = jnp.take(ys, idx, axis=0)
            ps = jnp.take(ps, idx, axis=0)
        p = jnp.mean(lpips_distance(lpips_params, ys, ps, normalize=False))
        s[f"Loss-Perceptual_{names[i]}-Reconstruction"] = p
        p_total = p_total + p
    p_total = p_total * perceptual_factor
    s["Loss-Perceptual-Reconstruction"] = p_total

    loss = l1 + spec + p_total
    return _add_q_losses(loss, q_losses, s), s


# ---------------------------------------------------------------------------
# factory (reference get_vqvae_loss, configure.py:22-53)
# ---------------------------------------------------------------------------


def get_vqvae_loss(name: str) -> Callable[..., LossResult]:
    """Return the loss callable for a registry name.  Losses needing
    LPIPS take ``lpips_params`` (and optionally ``rng``) kwargs; the
    factory defaults mirror the reference (drop_ratio 0.5 → keep 0.5)."""
    table = {
        "mse": mse_loss,
        "baur": baur_loss,
        "spectral": spectral_loss,
        "hartley": hartley_loss,
        "jukebox": jukebox_loss,
        "wavegan": wavegan_loss,
        "perceptual": perceptual_loss,
        "jukebox_perceptual": jukebox_perceptual_loss,
        "hartley_perceptual": hartley_perceptual_loss,
        "baseline": baseline_loss,
    }
    if name not in table:
        raise ValueError(
            f"Loss function unknown. Was given {name} but choices are "
            f"{list(table)}."
        )
    return table[name]


def loss_needs_lpips(name: str) -> bool:
    return name in (
        "perceptual",
        "jukebox_perceptual",
        "hartley_perceptual",
        "baseline",
    )


def lpips_net_for_loss(name: str) -> str:
    return "squeeze" if name == "baseline" else "alex"
