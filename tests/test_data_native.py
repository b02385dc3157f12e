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


def test_corrupt_shape_header_fails_clean(tmp_path):
    """A malformed archive whose npy-header shape disagrees with the payload
    size must be a clean open/read error, NOT a heap overflow: npz_read
    memcpys header-declared payload bytes into a buffer Python sized from
    the shape (round-3 hardening)."""
    p = tmp_path / "ok.npz"
    np.savez(p, a=np.arange(4, dtype=np.float32))  # stored (uncompressed)
    blob = bytearray(p.read_bytes())
    # patch the ASCII shape tuple in-place (same byte length): (4,) -> (9,)
    i = blob.find(b"'shape': (4,)")
    assert i > 0
    blob[i:i + 13] = b"'shape': (9,)"
    bad = tmp_path / "bad.npz"
    bad.write_bytes(bytes(blob))
    with pytest.raises(OSError):
        load_npz_native(str(bad))


def test_mixed_weight_concat_seeds_neutral_weights():
    """Concatenating a weighted with an unweighted dataset must keep the
    weights (neutral 1.0 for the unweighted side), not silently drop them."""
    from headpose_tpu.data.datasets import Dataset
    a = Dataset(np.zeros((3, 8), np.float32), np.zeros((3, 3), np.float32),
                np.full((3,), 0.5, np.float32))
    b = Dataset(np.ones((2, 8), np.float32), np.ones((2, 3), np.float32))
    for ds in (a.concat(b), b.concat(a)):
        assert ds.weights is not None and len(ds.weights) == 5
    np.testing.assert_array_equal(a.concat(b).weights,
                                  [0.5, 0.5, 0.5, 1.0, 1.0])
