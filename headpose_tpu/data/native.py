"""ctypes bindings for the native C++ npz loader.

Builds headpose_tpu/native/npz_loader.cpp on first use (g++ -O3, linked
against zlib) and exposes load_npz_native(path) with np.load semantics for
the dataset files the framework consumes.  Falls back transparently when no
compiler is available — data.datasets prefers this path when it imports.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from ..utils.nativelib import NativeLibrary

__all__ = ["native_available", "load_npz_native", "load_many"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _configure(lib: ctypes.CDLL) -> None:
    lib.npz_open.restype = ctypes.c_void_p
    lib.npz_open.argtypes = [ctypes.c_char_p]
    lib.npz_num_entries.argtypes = [ctypes.c_void_p]
    lib.npz_entry_name.restype = ctypes.c_char_p
    lib.npz_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_entry_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
    lib.npz_entry_bytes.restype = ctypes.c_long
    lib.npz_entry_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_entry_fortran.restype = ctypes.c_int
    lib.npz_entry_fortran.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.npz_read.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.npz_close.argtypes = [ctypes.c_void_p]


_library = NativeLibrary(os.path.join(_NATIVE_DIR, "npz_loader.cpp"),
                         os.path.join(_NATIVE_DIR, "libnpzloader.so"),
                         flags=("-lz",), configure=_configure)
_load = _library.load


def native_available() -> bool:
    return _library.available()


def load_npz_native(path: str) -> dict[str, np.ndarray]:
    """Read an npz archive via the C++ loader → {name: array} (np.load parity;
    entry names have their '.npy' suffix stripped like np.load's keys)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native npz loader unavailable (no g++/zlib)")
    handle = lib.npz_open(path.encode())
    if not handle:
        raise OSError(f"cannot open npz: {path}")
    try:
        out: dict[str, np.ndarray] = {}
        for i in range(lib.npz_num_entries(handle)):
            name = lib.npz_entry_name(handle, i).decode()
            if name.endswith(".npy"):
                name = name[:-4]
            dtype_buf = ctypes.create_string_buffer(16)
            shape = (ctypes.c_long * 16)()
            ndim = ctypes.c_int(16)
            lib.npz_entry_info(handle, i, dtype_buf, shape, ctypes.byref(ndim))
            dt = np.dtype(dtype_buf.value.decode())
            order = "F" if lib.npz_entry_fortran(handle, i) else "C"
            arr = np.empty([shape[d] for d in range(ndim.value)], dtype=dt,
                           order=order)
            if lib.npz_entry_bytes(handle, i) != arr.nbytes:
                # second line of defence behind the C-side size validation:
                # npz_read memcpys entry_bytes into arr's buffer
                raise OSError(
                    f"npz entry {name} in {path}: payload size "
                    f"{lib.npz_entry_bytes(handle, i)} != array {arr.nbytes}")
            if lib.npz_read(handle, i,
                            arr.ctypes.data_as(ctypes.c_void_p)) != 0:
                raise OSError(f"native read failed for {name} in {path}")
            out[name] = arr
        return out
    finally:
        lib.npz_close(handle)


def load_many(paths: list[str], max_workers: int = 8
              ) -> dict[str, dict[str, np.ndarray]]:
    """Load several npz files concurrently.  ctypes calls drop the GIL, so
    the C++ loader parallelizes across real threads — the dataset-directory
    scan (data.standard_splits over 12 files) loads in one file's time."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = pool.map(load_npz_native, paths)
    return dict(zip(paths, results))
