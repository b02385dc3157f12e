"""Native C++ npz loader: bit-parity with np.load on the shipped datasets."""
import glob
import os

import numpy as np
import pytest

from headpose_tpu.data.native import native_available, load_npz_native, load_many

from conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no g++/zlib toolchain for the native loader")


@pytest.mark.skipif(not has_reference(), reason="reference datasets not mounted")
def test_all_reference_datasets_bit_identical():
    files = sorted(glob.glob(os.path.join(REFERENCE_ROOT,
                                          "FeatureMaps-Datasets", "*.npz")))
    assert files
    for f in files:
        ref = dict(np.load(f))
        nat = load_npz_native(f)
        assert set(ref) == set(nat)
        for k in ref:
            assert ref[k].dtype == nat[k].dtype
            np.testing.assert_array_equal(ref[k], nat[k])


def test_roundtrip_own_archives(tmp_path):
    rng = np.random.default_rng(0)
    arrays = {
        "features": rng.normal(size=(100, 96)).astype(np.float32),
        "poses": rng.normal(size=(100, 3)).astype(np.float32),
        "ints": rng.integers(0, 100, size=(7,)).astype(np.int64),
        "f64": rng.normal(size=(3, 4, 5)),
    }
    for name, saver in (("c.npz", np.savez_compressed), ("u.npz", np.savez)):
        path = str(tmp_path / name)
        saver(path, **arrays)
        out = load_npz_native(path)
        for k, v in arrays.items():
            np.testing.assert_array_equal(out[k], v)


def test_load_many(tmp_path):
    paths = []
    for i in range(4):
        p = str(tmp_path / f"d{i}.npz")
        np.savez_compressed(p, x=np.full((10,), i, np.float32))
        paths.append(p)
    out = load_many(paths)
    for i, p in enumerate(paths):
        assert out[p]["x"][0] == i


def test_missing_file():
    with pytest.raises(OSError):
        load_npz_native("/does/not/exist.npz")


def test_fortran_order_member(tmp_path):
    """F-contiguous arrays round-trip correctly (fortran_order npy flag)."""
    a = np.asfortranarray(np.arange(24, dtype=np.float32).reshape(4, 6))
    p = str(tmp_path / "f.npz")
    np.savez(p, f=a, c=np.ascontiguousarray(a))
    out = load_npz_native(p)
    np.testing.assert_array_equal(out["f"], a)
    np.testing.assert_array_equal(out["c"], a)
