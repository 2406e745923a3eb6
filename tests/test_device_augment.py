"""Device-side augmentation (ops/augment.py + draw_device_params):

- affine_resample matches scipy.ndimage.affine_transform (order=1,
  constant-zero padding) — the host path's exact semantics
- the full device chain matches a host recomputation from the same
  drawn parameters
- draw_device_params consumes the per-sample rng stream like the host
  augment branch (identical traces) and is deterministic given a seed
- dataset/loader plumbing: device_augment datasets ship the params and
  the collated batch feeds augment_batch
"""

import numpy as np
import pytest
from scipy import ndimage

from synthanatomy_tpu.data.transforms import VQVAETransform, _draw_affine
from synthanatomy_tpu.ops.augment import affine_resample, augment_batch


def test_affine_resample_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(12, 14, 10)).astype(np.float32)
    M, offset = _draw_affine(
        rng, x.shape, x.shape,
        rotate_range=0.3, translate_range=2.0, scale_range=0.1,
    )
    want = ndimage.affine_transform(
        x, M, offset=offset, output_shape=x.shape, order=1,
        mode="constant", cval=0.0,
    )
    got = np.asarray(affine_resample(x, M.astype(np.float32), offset.astype(np.float32)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_device_chain_matches_host_recomputation():
    """With every transform fired (p=1), the device chain must equal
    the host ops applied with the SAME drawn parameters (the noise
    term is pinned to the device formula by construction)."""
    import jax

    tf = VQVAETransform(
        augment=True, augmentation_probability=1.0, augmentation_strength=2.0,
        normalize=False,
    )
    rng = np.random.default_rng(7)
    x = np.random.default_rng(1).uniform(size=(10, 12, 8)).astype(np.float32)
    params, trace = tf.draw_device_params(x.shape, rng)
    assert all(trace.values())  # p=1: everything fired

    got = np.asarray(
        augment_batch(x[None, ..., None], {k: v[None] for k, v in params.items()})
    )[0, ..., 0]

    # host recomputation from the same params
    want = ndimage.affine_transform(
        x, params["matrix"].astype(np.float64),
        offset=params["offset"].astype(np.float64), output_shape=x.shape,
        order=1, mode="constant", cval=0.0,
    ).astype(np.float32)
    eps = 1e-7
    mn, rngv = want.min(), max(want.max() - want.min(), eps)
    want = ((want - mn) / rngv) ** float(params["gamma"]) * rngv + mn
    want = want + float(params["shift"])
    noise = float(params["noise_std"]) * np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(int(params["noise_seed"])), x.shape, np.float32
        )
    )
    want = np.clip(want + noise, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=5e-4)


def _smooth_volume(shape, seed=0):
    """Low-frequency test volume: multi-pass resampling differences are
    interpolation-order effects, visible on noise but tiny on smooth
    data (the regime brain MRI lives in)."""
    rng = np.random.default_rng(seed)
    d, h, w = shape
    ii, jj, kk = np.meshgrid(
        np.linspace(0, 2 * np.pi, d), np.linspace(0, 2 * np.pi, h),
        np.linspace(0, 2 * np.pi, w), indexing="ij",
    )
    a, b, c = rng.uniform(0.5, 1.5, 3)
    vol = 0.5 + 0.25 * np.sin(a * ii) * np.cos(b * jj) + 0.25 * np.sin(c * kk)
    return vol.astype(np.float32)


def test_shear_resample_matches_trilinear_interior():
    """The 3-pass resampler must agree with the exact trilinear gather
    on the interior of a smooth volume for small (augmentation-scale)
    affines."""
    from synthanatomy_tpu.ops.augment import (
        affine_resample_shear,
        shear_shift_bounds,
    )

    shape = (24, 28, 20)
    x = _smooth_volume(shape)
    ranges = dict(rotate_range=0.08, translate_range=2.0, scale_range=0.06)
    shifts = shear_shift_bounds(shape, **ranges)
    for seed in range(4):
        M, off = _draw_affine(
            np.random.default_rng(seed), shape, shape, **ranges
        )
        M32, off32 = M.astype(np.float32), off.astype(np.float32)
        exact = np.asarray(affine_resample(x, M32, off32))
        fast = np.asarray(affine_resample_shear(x, M32, off32, shifts))
        # interior region (edges differ by design: per-pass vs single
        # domain test)
        sl = tuple(slice(4, -4) for _ in range(3))
        err = np.abs(fast[sl] - exact[sl]).max()
        assert err < 2e-2, (seed, err)
        # and the bulk agrees tightly
        assert np.abs(fast[sl] - exact[sl]).mean() < 2e-3


def test_shear_shift_bounds_cover_extreme_draws():
    """The static bound must cover the integer shifts of every pass for
    parameters drawn at the extremes (otherwise edge voxels clip)."""
    from synthanatomy_tpu.ops.augment import (
        _pass_coeffs,
        shear_shift_bounds,
    )

    shape = (32, 40, 28)
    ranges = dict(rotate_range=0.44, translate_range=4.0, scale_range=0.07)
    shifts = shear_shift_bounds(shape, **ranges)
    rng_all = np.random.default_rng(0)
    for _ in range(50):
        M, off = _draw_affine(rng_all, shape, shape, **ranges)
        p0, p1, p2 = _pass_coeffs(
            np.asarray(M, np.float32), np.asarray(off, np.float32)
        )
        exts = tuple(np.asarray(shape) - 1)
        for axis, co in enumerate((p0, p1, p2)):
            ai, aj, ak, c = (float(v) for v in co)
            own = (ai, aj, ak)[axis]
            others = [v for n, v in enumerate((ai, aj, ak)) if n != axis]
            oexts = [e for n, e in enumerate(exts) if n != axis]
            # |position - own coord| is linear over the coordinate box →
            # its extreme is at a corner
            corners = [
                abs((own - 1.0) * e0 + others[0] * e1 + others[1] * e2 + c)
                for e0 in (0, exts[axis])
                for e1 in (0, oexts[0])
                for e2 in (0, oexts[1])
            ]
            assert max(corners) <= shifts[axis], (axis, max(corners), shifts)


def test_augment_batch_shear_mode_end_to_end():
    tf = VQVAETransform(
        augment=True, augmentation_probability=1.0, normalize=False
    )
    from synthanatomy_tpu.ops.augment import shear_shift_bounds

    shape = (16, 16, 16)
    x = _smooth_volume(shape, seed=3)
    params, _ = tf.draw_device_params(shape, np.random.default_rng(5))
    shifts = shear_shift_bounds(shape, **tf.affine_ranges())
    batched = {k: v[None] for k, v in params.items()}
    fast = np.asarray(augment_batch(x[None, ..., None], batched, shifts))
    exact = np.asarray(augment_batch(x[None, ..., None], batched))
    assert fast.shape == exact.shape
    sl = (0, slice(3, -3), slice(3, -3), slice(3, -3), 0)
    np.testing.assert_allclose(fast[sl], exact[sl], atol=3e-2)


def test_draw_device_params_trace_matches_host_stream():
    """Same rng state → identical fire decisions as the host path, and
    when nothing fires the rng streams stay aligned end-to-end."""
    for seed in range(8):
        tf = VQVAETransform(augment=True, augmentation_probability=0.4,
                            normalize=False)
        r_host = np.random.default_rng(seed)
        r_dev = np.random.default_rng(seed)
        x = np.random.default_rng(0).uniform(size=(6, 6, 6)).astype(np.float32)
        _, t_host = tf(x, r_host)
        _, t_dev = tf.draw_device_params(x.shape, r_dev)
        assert t_host == t_dev


def test_draw_device_params_deterministic():
    tf = VQVAETransform(augment=True, augmentation_probability=1.0,
                        normalize=False)
    p1, _ = tf.draw_device_params((8, 8, 8), np.random.default_rng(3))
    p2, _ = tf.draw_device_params((8, 8, 8), np.random.default_rng(3))
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k])


def test_device_noise_distribution_matches_host():
    """Distribution-level equivalence of the one intentional rng
    divergence (ops/augment.py noise): device noise values come from
    ``jax.random.normal`` while the host path uses
    ``np.random.Generator.normal`` — same N(0, std²) law, different
    streams.  Pin it with moments + a two-sample KS test over >=1e4
    draws per side (VERDICT r4 weak #6)."""
    import jax
    from scipy import stats

    std = 0.37
    n = 40_000
    # device draws exactly as _augment_one computes them, across many
    # per-sample seeds (the production regime: one PRNGKey per sample)
    dev = np.concatenate([
        np.asarray(
            std * jax.random.normal(jax.random.PRNGKey(s), (n // 8,), np.float32)
        )
        for s in range(8)
    ])
    host = np.random.default_rng(123).normal(0.0, std, n).astype(np.float32)

    # moments: mean within 3 std-errors, variance within 5%
    se = std / np.sqrt(n)
    assert abs(dev.mean()) < 3 * se, dev.mean()
    assert abs(host.mean()) < 3 * se, host.mean()
    np.testing.assert_allclose(dev.std(), std, rtol=0.05)
    np.testing.assert_allclose(host.std(), std, rtol=0.05)
    # skew/kurtosis both ~0 for a Gaussian
    assert abs(stats.skew(dev)) < 0.05 and abs(stats.kurtosis(dev)) < 0.1
    # two-sample KS: same underlying law
    ks = stats.ks_2samp(dev, host)
    assert ks.pvalue > 1e-3, (ks.statistic, ks.pvalue)
    # and each side against the analytic N(0, std) CDF
    for sample in (dev, host):
        k1 = stats.kstest(sample, "norm", args=(0.0, std))
        assert k1.pvalue > 1e-3, (k1.statistic, k1.pvalue)


def test_patch_mode_not_supported():
    tf = VQVAETransform(augment=True, patch_size=(4, 4, 4))
    assert not tf.supports_device_augment()


def test_dataset_ships_params_and_loader_collates(tmp_path):
    from synthanatomy_tpu.data.datasets import PrefetchLoader, VolumeDataset
    from synthanatomy_tpu.data.nifti import save_nifti

    rng = np.random.default_rng(0)
    subjects = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.nii.gz")
        save_nifti(p, rng.uniform(size=(8, 8, 8)).astype(np.float32))
        subjects.append({"MRI": p})
    tf = VQVAETransform(augment=True, augmentation_probability=1.0)
    ds = VolumeDataset(subjects, tf, device_augment=True, use_native=False)
    assert ds.device_augment
    loader = PrefetchLoader(ds, batch_size=2, num_workers=1, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    assert batch["MRI"].shape == (2, 8, 8, 8, 1)
    assert batch["augment"]["matrix"].shape == (2, 3, 3)
    assert batch["traces"][0]["RandAffined"]
    out = np.asarray(augment_batch(batch["MRI"], batch["augment"]))
    assert out.shape == (2, 8, 8, 8, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the host volume is pre-augment: the device output must differ
    assert not np.allclose(out, np.clip(batch["MRI"], 0, 1))


def test_runner_training_with_device_augmentation(tmp_path, monkeypatch):
    """run_vqvae training with device_augmentation=True goes through the
    shear-path selection in the runner (production ranges are well under
    the 0.5 rad gate) and trains to a finite loss."""
    from run_vqvae import run as run_vqvae
    from synthanatomy_tpu.data.nifti import save_nifti
    from synthanatomy_tpu.ops import augment as aug_mod

    picked = []
    real_bounds = aug_mod.shear_shift_bounds

    def spy(shape, **kw):
        out = real_bounds(shape, **kw)
        picked.append(out)
        return out

    monkeypatch.setattr(aug_mod, "shear_shift_bounds", spy)

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        save_nifti(
            str(data / f"s{i}.nii.gz"),
            rng.uniform(size=(24, 24, 24)).astype(np.float32),
        )
    result = run_vqvae(
        mode="training", training_subjects=str(data),
        validation_subjects=str(data), project_directory=str(tmp_path),
        experiment_name="devaug", epochs=1, batch_size=2,
        eval_batch_size=2, eval_every=1, checkpoint_every=1,
        num_workers=0, loss="mse", augmentation_probability=1.0,
        device_augmentation=True, no_levels=2,
        downsample_parameters=((4, 2, 1, 1), (4, 2, 1, 1)),
        upsample_parameters=((4, 2, 1, 0, 1), (4, 2, 1, 0, 1)),
        no_channels=8, no_res_layers=1, num_embeddings=(16,),
        embedding_dim=(4,), decay=(0.5,), gamma=0.999,
        compute_dtype="float32", use_pallas_vq=False, seed=7,
    )
    assert np.isfinite(result["history"][-1]["Loss-Reconstruction-Total"])
    # the shear path was selected and its bound computed for the volume
    assert picked and all(all(s > 0 for s in b) for b in picked)
