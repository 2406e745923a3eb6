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
