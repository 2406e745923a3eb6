import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthanatomy_tpu.data import transforms as T
from synthanatomy_tpu.data.datasets import (
    LatentDataset,
    PrefetchLoader,
    VolumeDataset,
    discover_decoding_subjects,
    discover_subjects,
    load_conditionings,
)
from synthanatomy_tpu.data.nifti import closest_canonical, load_nifti, save_nifti, NiftiImage
from synthanatomy_tpu.metrics import get_ms_ssim_window, mae, ms_ssim_3d, mse, ssim_3d


# ---------------------------------------------------------------------------
# NIfTI
# ---------------------------------------------------------------------------


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.uniform(size=(16, 20, 12)).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    for name in ("a.nii", "b.nii.gz"):
        p = str(tmp_path / name)
        save_nifti(p, vol, affine)
        img = load_nifti(p, as_closest_canonical=False)
        np.testing.assert_allclose(img.data, vol, rtol=1e-6)
        np.testing.assert_allclose(img.affine, affine, rtol=1e-6)


def test_nifti_dtypes(tmp_path):
    for dt in (np.uint8, np.int16, np.float32, np.uint16):
        vol = (np.arange(60).reshape(3, 4, 5) % 200).astype(dt)
        p = str(tmp_path / f"{np.dtype(dt).name}.nii.gz")
        save_nifti(p, vol)
        img = load_nifti(p, as_closest_canonical=False)
        np.testing.assert_array_equal(img.data, vol)


def test_closest_canonical_identity_for_ras():
    vol = np.arange(24).reshape(2, 3, 4).astype(np.float32)
    img = NiftiImage(vol, np.eye(4))
    out = closest_canonical(img)
    np.testing.assert_array_equal(out.data, vol)
    np.testing.assert_allclose(out.affine, np.eye(4))


def test_closest_canonical_flips_and_permutes():
    torch = pytest.importorskip("numpy")  # placeholder: oracle below is manual
    vol = np.arange(24).reshape(2, 3, 4).astype(np.float32)
    # LPS affine (flip x and y)
    affine = np.diag([-1.0, -1.0, 1.0, 1.0])
    affine[:3, 3] = [1.0, 2.0, 0.0]
    out = closest_canonical(NiftiImage(vol, affine))
    np.testing.assert_array_equal(out.data, np.flip(np.flip(vol, 0), 1))
    # resulting affine must be RAS-positive on the diagonal
    assert (np.diag(out.affine)[:3] > 0).all()
    # world coordinates of a voxel must be preserved: voxel (0,0,0) in
    # the new image == voxel (1,2,0) in the old one
    np.testing.assert_allclose(
        out.affine @ np.array([0, 0, 0, 1.0]),
        affine @ np.array([1, 2, 0, 1.0]),
    )
    # axis permutation case
    perm_affine = np.zeros((4, 4))
    perm_affine[0, 1] = 1.0  # input axis 1 → output x
    perm_affine[1, 2] = 1.0
    perm_affine[2, 0] = 1.0
    perm_affine[3, 3] = 1.0
    out2 = closest_canonical(NiftiImage(vol, perm_affine))
    assert out2.data.shape == (3, 4, 2)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_scale_crop_pad():
    x = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    s = T.scale_intensity(x)
    assert s.min() == 0.0 and s.max() == 1.0
    c = T.center_spatial_crop(x, (2, 2, 2))
    assert c.shape == (2, 2, 2)
    cc = T.spatial_crop(x, (1, 1, 1), (3, 5, 7))
    assert cc.shape == (2, 4, 6)
    p = T.spatial_pad(cc, (8, 8, 8))
    assert p.shape == (8, 8, 8)


def test_vqvae_transform_deterministic_and_traced():
    rng_data = np.random.default_rng(0)
    vol = rng_data.uniform(size=(24, 24, 24)).astype(np.float32)
    tf = T.VQVAETransform(
        roi=((2, 20), (2, 20), (2, 20)),
        augment=True,
        augmentation_probability=0.9,
    )
    out1, tr1 = tf(vol, np.random.default_rng(7))
    out2, tr2 = tf(vol, np.random.default_rng(7))
    np.testing.assert_array_equal(out1, out2)
    assert tr1 == tr2
    assert out1.shape == (18, 18, 18)
    assert out1.min() >= 0.0 and out1.max() <= 1.0
    assert "RandAffined" in tr1 and "RandGaussianNoised" in tr1


def test_vqvae_transform_patch_mode():
    vol = np.random.default_rng(0).uniform(size=(24, 24, 24)).astype(np.float32)
    tf = T.VQVAETransform(
        patch_size=(8, 8, 8), augment=True, augmentation_probability=1.0
    )
    out, trace = tf(vol, np.random.default_rng(3))
    assert out.shape == (8, 8, 8)
    assert trace["RandFlipd_0"] and trace["RandRotate90d_01"]


def test_transform_int_roi_center_crop():
    vol = np.random.default_rng(0).uniform(size=(30, 30, 30)).astype(np.float32)
    tf = T.VQVAETransform(roi=(16, 16, 16), augment=False)
    out, _ = tf(vol)
    assert out.shape == (16, 16, 16)


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


@pytest.fixture()
def nifti_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "subjects"
    d.mkdir()
    for i in range(6):
        save_nifti(str(d / f"s{i}.nii.gz"), rng.uniform(size=(16, 16, 16)).astype(np.float32))
    return str(d)


def test_discover_subjects(nifti_dir, tmp_path):
    subs = discover_subjects(nifti_dir)
    assert len(subs) == 6
    # augmentation replication in extracting mode
    subs_aug = discover_subjects(nifti_dir, mode="extracting", no_augmented_extractions=3)
    assert len(subs_aug) == 18
    assert subs_aug[1]["augmentation_id"] == 1
    # csv discovery
    import pandas as pd

    csv = tmp_path / "subs.csv"
    pd.DataFrame({"path": [s["MRI"] for s in subs]}).to_csv(csv, index=False)
    assert len(discover_subjects(str(csv))) == 6
    with pytest.raises(ValueError):
        discover_subjects(str(tmp_path / "nope.txt"))


def test_decoding_subjects(tmp_path):
    for i in range(3):
        np.save(tmp_path / f"q{i}.npy", np.zeros((4, 4, 4), np.uint16))
    subs = discover_decoding_subjects(str(tmp_path))
    assert len(subs) == 3
    assert "quantization_0" in subs[0]


def test_volume_dataset_and_loader(nifti_dir):
    ds = VolumeDataset(
        discover_subjects(nifti_dir),
        T.VQVAETransform(roi=(12, 12, 12), augment=True),
    )
    sample = ds.get(0)
    assert sample["MRI"].shape == (12, 12, 12, 1)

    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["MRI"].shape == (2, 12, 12, 12, 1)
    # deterministic epoch order
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["MRI"], again[0]["MRI"])
    # different epoch shuffles differently
    other = list(loader.epoch(1))
    assert not all(
        np.array_equal(a["MRI"], b["MRI"]) for a, b in zip(batches, other)
    )


def test_loader_sharding(nifti_dir):
    ds = VolumeDataset(
        discover_subjects(nifti_dir), T.VQVAETransform(roi=(8, 8, 8), augment=False)
    )
    shard_sizes = []
    seen = []
    for shard in range(2):
        loader = PrefetchLoader(
            ds, batch_size=1, shard_id=shard, num_shards=2, shuffle=False
        )
        batches = list(loader.epoch(0))
        shard_sizes.append(len(batches))
        seen += [b["paths"][0] for b in batches]
    assert shard_sizes == [3, 3]
    assert len(set(seen)) == 6  # disjoint cover


def test_latent_dataset_conditionings(tmp_path):
    import pandas as pd

    lat_dir = tmp_path / "latents"
    lat_dir.mkdir()
    for i in range(4):
        np.save(lat_dir / f"s{i}.npy", np.full((2, 2, 2), i, np.uint16))
    pd.DataFrame(
        {
            "subject": [f"s{i}.npy" for i in range(4)] + ["extra.npy"],
            "age": [60.0, 70.0, 60.0, np.nan, 80.0],
        }
    ).to_csv(tmp_path / "cond.csv", index=False)

    subs = discover_decoding_subjects(str(lat_dir))
    names = [os.path.basename(s["quantization_0"]) for s in subs]
    values, vocab, kept = load_conditionings(
        str(tmp_path / "cond.csv"), ["age"], names
    )
    assert kept == [0, 1, 2]  # NaN row dropped
    assert vocab == (2,)

    ds = LatentDataset(
        [subs[i] for i in kept],
        conditioning_values=values,
        conditioning_names=["age"],
    )
    assert ds.conditioning_num_tokens == (2,)
    s = ds.get(1)
    assert s["latents"].shape == (2, 2, 2)
    assert s["conditionings"][0] == 1  # 70.0 → token 1


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_mae_mse():
    a = jnp.ones((2, 4, 4, 4, 1))
    b = jnp.zeros((2, 4, 4, 4, 1))
    assert float(mae(a, b)) == 1.0
    assert float(mse(a * 2, b)) == 4.0


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 24, 24, 24, 1)), jnp.float32)
    assert float(ssim_3d(x, x, win_size=7)) == pytest.approx(1.0, abs=1e-5)
    y = jnp.clip(x + 0.3, 0, 1)
    assert float(ssim_3d(x, y, win_size=7)) < 0.95


def test_ms_ssim_3d():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 96, 96, 96, 1)), jnp.float32)
    v = float(ms_ssim_3d(x, x, win_size=3))
    assert v == pytest.approx(1.0, abs=1e-4)
    noisy = jnp.clip(x + 0.2 * jax.random.normal(jax.random.key(0), x.shape), 0, 1)
    assert float(ms_ssim_3d(x, noisy, win_size=3)) < 0.9


def _oracle_gaussian(win, sigma=1.5):
    c = np.arange(win, dtype=np.float64) - win // 2
    g = np.exp(-(c**2) / (2 * sigma**2))
    return g / g.sum()


def _oracle_blur(x, k):
    """Separable 'valid' correlation over D, H, W of (B, D, H, W, C) —
    independent NumPy path (np.convolve per axis)."""
    for ax in (1, 2, 3):
        x = np.apply_along_axis(
            lambda v: np.convolve(v, k[::-1], mode="valid"), ax, x
        )
    return x


def _oracle_ssim_parts(x, y, win, k1=0.01, k2=0.03, data_range=1.0):
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    k = _oracle_gaussian(win)
    mx, my = _oracle_blur(x, k), _oracle_blur(y, k)
    sxx = _oracle_blur(x * x, k) - mx * mx
    syy = _oracle_blur(y * y, k) - my * my
    sxy = _oracle_blur(x * y, k) - mx * my
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim = ((2 * mx * my + c1) / (mx * mx + my * my + c1)) * cs
    return ssim.mean(axis=(1, 2, 3, 4)), cs.mean(axis=(1, 2, 3, 4))


def test_ms_ssim_matches_numpy_oracle():
    """Pin the MS-SSIM pyramid against an independent NumPy
    implementation of the pytorch_msssim algorithm (separable Gaussian
    window σ=1.5, K=(0.01, 0.03), relu-clamped cs, 2× avg-pool, the
    standard 5 weights) — the package itself is not installable in this
    environment, so the published algorithm is the oracle."""
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 48, 48, 48, 1)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)

    weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    xs, ys = x, y
    mcs, val = [], None
    for i in range(5):
        s, cs = _oracle_ssim_parts(xs, ys, win=3)
        if i < 4:
            mcs.append(np.maximum(cs, 0))
            xs = _oracle_pool(xs)
            ys = _oracle_pool(ys)
        else:
            val = np.maximum(s, 0)
    expect = val ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        expect = expect * cs**w
    expect = expect.mean()

    got = float(ms_ssim_3d(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), win_size=3))
    assert got == pytest.approx(float(expect), abs=2e-4)

    # single-scale too
    s_expect = _oracle_ssim_parts(x, y, win=7)[0].mean()
    s_got = float(ssim_3d(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), win_size=7))
    assert s_got == pytest.approx(float(s_expect), abs=2e-4)


def _oracle_pool(x):
    b, d, h, w, c = x.shape
    return x[:, : d // 2 * 2, : h // 2 * 2, : w // 2 * 2].reshape(
        b, d // 2, 2, h // 2, 2, w // 2, 2, c
    ).mean(axis=(2, 4, 6))


def test_get_ms_ssim_window_rule():
    assert get_ms_ssim_window(input_shape=(176, 224, 176)) == 11
    # 160/16 + 1 = 11 → floor(11/2) = 5
    assert get_ms_ssim_window(roi=(160, 224, 160)) == 5
    assert get_ms_ssim_window(roi=((16, 176), (16, 240), (96, 256))) == 5
    with pytest.raises(ValueError):
        get_ms_ssim_window(eval_patch_size=(16, 16, 16))


def test_loader_propagates_worker_errors(nifti_dir):
    class Broken(VolumeDataset):
        def get(self, index, epoch=0):
            raise RuntimeError("boom")

    ds = Broken(
        discover_subjects(nifti_dir), T.VQVAETransform(augment=False)
    )
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader.epoch(0))


def test_conditioning_preprocessing_helpers(tmp_path):
    import pandas as pd

    from synthanatomy_tpu.utils.general import (
        quantize_conditionings,
        uniform_sampling,
    )

    df = pd.DataFrame(
        {
            "subject": [f"s{i}" for i in range(12)],
            "age": np.linspace(50, 80, 12),
            "group": [0, 1] * 6,
        }
    )
    src = tmp_path / "cond.csv"
    df.to_csv(src, index=False)

    out = quantize_conditionings(
        str(src), "subject", ("age",), (3,), str(tmp_path), "quantized"
    )
    q = pd.read_csv(out)
    assert set(q["age"].unique()) == {0, 1, 2}

    out2 = uniform_sampling(str(src), ("group",), str(tmp_path))
    u = pd.read_csv(out2)
    assert (u.groupby("group").size() == u.groupby("group").size().min()).all()
