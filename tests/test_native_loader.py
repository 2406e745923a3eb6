import numpy as np
import pytest

from synthanatomy_tpu.data.nifti import load_nifti, save_nifti
from synthanatomy_tpu.native import (
    NativeUnavailable,
    load_nifti_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native loader"
)


def test_native_matches_python_reader(tmp_path):
    rng = np.random.default_rng(0)
    vol = (rng.uniform(0, 1000, (24, 20, 16))).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [5, 6, 7]
    for name in ("x.nii", "x.nii.gz"):
        p = str(tmp_path / name)
        save_nifti(p, vol, affine)
        nv, na = load_nifti_native(p)
        py = load_nifti(p, as_closest_canonical=False)
        np.testing.assert_allclose(nv, py.data, rtol=1e-6)
        np.testing.assert_allclose(na, py.affine, rtol=1e-5)


def test_native_dtypes_and_normalize(tmp_path):
    for dt in (np.uint8, np.int16, np.uint16, np.float64):
        vol = np.arange(4 * 5 * 6).reshape(4, 5, 6).astype(dt)
        p = str(tmp_path / f"{np.dtype(dt).name}.nii.gz")
        save_nifti(p, vol)
        nv, _ = load_nifti_native(p)
        np.testing.assert_allclose(nv, vol.astype(np.float32))
        nn, _ = load_nifti_native(p, normalize=True)
        assert nn.min() == 0.0 and nn.max() == 1.0


def test_native_error_on_missing_file():
    with pytest.raises(IOError):
        load_nifti_native("/nonexistent/file.nii.gz")


def _orientation_affines():
    import numpy as np

    eye = np.eye(4)
    diag = np.diag([1.0, 2.0, 3.0, 1.0])
    diag[:3, 3] = [5, 6, 7]
    perm = np.zeros((4, 4))  # axis permutation + one flip
    perm[0, 2], perm[1, 0], perm[2, 1], perm[3, 3] = 1, -1, 1, 1
    perm[:3, 3] = [1, 2, 3]
    flips = np.eye(4)
    flips[0, 0] = flips[1, 1] = -1
    th = 0.3  # small in-plane rotation (non-axis-aligned directions)
    rot = np.eye(4)
    rot[0, 0] = rot[1, 1] = np.cos(th)
    rot[0, 1], rot[1, 0] = -np.sin(th), np.sin(th)
    return [eye, diag, perm, flips, rot]


def test_native_canonical_matches_python(tmp_path):
    """The C++ gather pass (permute+flip+transpose fused into decode)
    must reproduce closest_canonical exactly — data AND affine."""
    rng = np.random.default_rng(3)
    for i, aff in enumerate(_orientation_affines()):
        vol = rng.uniform(0, 1000, (11, 13, 7)).astype(np.float32)
        p = str(tmp_path / f"c{i}.nii.gz")
        save_nifti(p, vol, aff)
        nv, na = load_nifti_native(p, canonical=True)
        py = load_nifti(p, as_closest_canonical=True)
        assert nv.flags["C_CONTIGUOUS"]
        np.testing.assert_allclose(nv, np.asarray(py.data, np.float32), rtol=1e-6)
        np.testing.assert_allclose(na, py.affine, rtol=1e-5, atol=1e-5)


def test_native_canonical_with_normalize(tmp_path):
    rng = np.random.default_rng(4)
    aff = _orientation_affines()[2]
    vol = rng.uniform(-50, 1000, (10, 12, 8)).astype(np.int16)
    p = str(tmp_path / "cn.nii.gz")
    save_nifti(p, vol, aff)
    nv, _ = load_nifti_native(p, normalize=True, canonical=True)
    py = load_nifti(p, as_closest_canonical=True)
    ref = np.asarray(py.data, np.float32)
    ref = (ref - ref.min()) / (ref.max() - ref.min())
    np.testing.assert_allclose(nv, ref, rtol=1e-5, atol=1e-6)
