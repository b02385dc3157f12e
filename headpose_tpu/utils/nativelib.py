"""Build-on-first-use loader for the C++ libraries in headpose_tpu/native.

ONE implementation of the g++-build / mtime-staleness / ABI-mismatch-rebuild
dance, shared by data.native (the npz loader) and runtime.edge (the edge
postprocess) — hardening applied here lands in every native component at
once.  Loading is lazy and failure is soft: callers get None and fall back
(or raise their own actionable error) when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable

__all__ = ["NativeLibrary"]


class NativeLibrary:
    """A .so built from one C++ source on first use.

    `configure(lib)` runs once after a successful load to set restype/
    argtypes; `flags` are extra g++ arguments (e.g. link libraries,
    float-semantics pins).
    """

    def __init__(self, src: str, lib_path: str, *,
                 flags: tuple[str, ...] = (),
                 configure: Callable[[ctypes.CDLL], None] | None = None):
        self._src = src
        self._lib_path = lib_path
        self._flags = tuple(flags)
        self._configure = configure
        self._lock = threading.Lock()
        self._lib: ctypes.CDLL | None = None
        self._failed = False

    def _build(self) -> bool:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", *self._flags,
                 "-o", self._lib_path, self._src],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    def load(self) -> ctypes.CDLL | None:
        with self._lock:
            if self._lib is not None:
                return self._lib
            if self._failed:
                return None
            if not os.path.exists(self._lib_path) or (
                    os.path.getmtime(self._lib_path)
                    < os.path.getmtime(self._src)):
                if not self._build():
                    self._failed = True
                    return None
            try:
                lib = ctypes.CDLL(self._lib_path)
            except OSError:
                # a prebuilt .so can be ABI-incompatible with this host
                # (arch/glibc/linked libs); rebuild from source once, then
                # give up cleanly instead of crashing every caller
                if not self._build():
                    self._failed = True
                    return None
                try:
                    lib = ctypes.CDLL(self._lib_path)
                except OSError:
                    self._failed = True
                    return None
            if self._configure is not None:
                self._configure(lib)
            self._lib = lib
            return lib

    def available(self) -> bool:
        return self.load() is not None
