"""ctypes bindings for the native C++ image loader (native/sphloader.cpp).

Decode (libjpeg/libpng) + bilinear resize + normalize + flip fused in C++,
batched over a std::thread pool — the GIL-free replacement for the
reference's torch DataLoader workers. Builds on demand with `make`; callers
fall back to the PIL pipeline when the toolchain or shared object is
unavailable (``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.hostfp import cpu_feature_fingerprint

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _so_candidates():
    """Search order: explicit override, installed package data, repo tree."""
    env = os.environ.get("SPH_LOADER_SO")
    if env:
        yield env
    yield os.path.join(os.path.dirname(__file__), "libsphloader.so")
    yield os.path.join(_NATIVE_DIR, "libsphloader.so")


_lib = None


def _host_marker() -> str:
    return os.path.join(_NATIVE_DIR, "libsphloader.so.host")


def _built_on_this_host() -> bool:
    try:
        with open(_host_marker()) as f:
            return f.read().strip() == cpu_feature_fingerprint()
    except OSError:
        return False


def _build(force: bool = False) -> bool:
    """Run make; ``force`` rebuilds even if mtimes say the .so is fresh.

    The .so is compiled with ``-march=native`` (native/Makefile), so a binary
    carried over from a different machine (sessions migrate VMs) can SIGILL —
    a host-fingerprint marker written on success makes that detectable, and
    ``make -B`` overrides the mtime check that would otherwise keep it.
    """
    cmd = ["make", "-B", "-C", _NATIVE_DIR] if force else \
        ["make", "-C", _NATIVE_DIR]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    try:
        with open(_host_marker(), "w") as f:
            f.write(cpu_feature_fingerprint())
    except OSError:
        pass
    return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = next((p for p in _so_candidates() if os.path.exists(p)), None)
    repo_so = os.path.join(_NATIVE_DIR, "libsphloader.so")
    if so is None or os.path.abspath(so) == os.path.abspath(repo_so):
        # Repo-tree builds are not committed (a binary built on one machine
        # may not run on another): (re)run make — forced when the .so on
        # disk was built on a different host, since an mtime-based no-op
        # would keep the foreign (SIGILL-prone) binary.
        stale_host = so is not None and not _built_on_this_host()
        if not _build(force=stale_host):
            if so is None or stale_host:
                return None  # nothing usable, or only a foreign binary
        so = repo_so if os.path.exists(repo_so) else so
        if so is None:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.sph_load_image.restype = ctypes.c_int
    lib.sph_load_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.sph_load_batch.restype = ctypes.c_int
    lib.sph_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    # uint8 variants (ship-uint8 / normalize-on-device pipeline); absent in
    # a shared object built before they existed — a rebuild adds them.
    try:
        lib.sph_load_image_u8.restype = ctypes.c_int
        lib.sph_load_image_u8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.sph_load_batch_u8.restype = ctypes.c_int
        lib.sph_load_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
    except AttributeError:
        pass
    # Packed-I420 variants (transfer_colorspace="yuv420"); absent in older
    # shared objects — a rebuild adds them.
    try:
        lib.sph_load_image_yuv.restype = ctypes.c_int
        lib.sph_load_image_yuv.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.sph_load_batch_yuv.restype = ctypes.c_int
        lib.sph_load_batch_yuv.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
    except AttributeError:
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_image(path: str, img_size, mean, std, flip: bool = False):
    """Decode+resize+normalize one image -> (H, W, 3) float32, or None."""
    lib = _load()
    if lib is None:
        return None
    h, w = img_size
    out = np.empty((h, w, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.sph_load_image(path.encode(), _fptr(out), h, w, _fptr(mean),
                            _fptr(std), int(flip))
    return out if rc == 0 else None


def load_image_u8(path: str, img_size, flip: bool = False):
    """Decode+resize (+flip) one image -> (H, W, 3) uint8, or None.

    For the normalize-on-device pipeline: same PIL-equivalent uint8
    quantization after bilinear resize, normalization deferred to the
    jitted step (engine.train.maybe_normalize_images).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "sph_load_image_u8"):
        return None
    h, w = img_size
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.sph_load_image_u8(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, int(flip))
    return out if rc == 0 else None


def load_image_yuv(path: str, img_size, flip: bool = False):
    """Decode+resample one image -> packed I420 ``(H*3/2, W)`` uint8, or None.

    Rows ``[0, H)`` hold Y; rows ``[H, H*3/2)`` hold the chroma strip with U
    in columns ``[0, W/2)`` and V in ``[W/2, W)`` (each ``(H/2, W/2)``).
    Halves host->device bytes vs RGB uint8; the jitted step upsamples chroma
    and converts to RGB (``engine.train.maybe_normalize_images``). JPEG
    sources are 4:2:0 already, so the subsampled chroma carries everything
    the encoder kept.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "sph_load_image_yuv"):
        return None
    h, w = img_size
    out = np.empty((h * 3 // 2, w), np.uint8)
    rc = lib.sph_load_image_yuv(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, int(flip))
    return out if rc == 0 else None


def load_batch(paths, img_size, mean, std, flips=None, n_threads: int = 0):
    """Decode a batch in parallel -> (N, H, W, 3) float32.

    Returns (array, n_failed); failed slots are zeroed.
    """
    lib = _load()
    if lib is None:
        return None, len(paths)
    h, w = img_size
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if flips is None:
        c_flips = None
    else:
        c_flips = (ctypes.c_int * n)(*[int(f) for f in flips])
    failed = lib.sph_load_batch(c_paths, n, _fptr(out), h, w, _fptr(mean),
                                _fptr(std), c_flips, n_threads)
    return out, int(failed)
