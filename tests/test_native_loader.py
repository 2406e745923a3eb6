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
