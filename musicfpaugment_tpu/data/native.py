"""ctypes bindings for the native C++ IO runtime (native/*.cc).

The library is optional: ``available()`` reports whether the .so exists (or
can be built on demand with ``build()``); callers fall back to scipy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmfpa_native.so")
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_lib: Optional[ctypes.CDLL] = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("frames", ctypes.c_int64),
        ("bits_per_sample", ctypes.c_int32),
        ("format", ctypes.c_int32),
    ]


def build() -> bool:
    """Compile the native library (make -C native). Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        _bind_symbols(lib)
    except AttributeError:
        # a stale prebuilt .so (older than the newest symbols, e.g. built
        # before mp3io.cc existed) — rebuild once, then give up gracefully so
        # callers fall back to the scipy paths instead of crashing
        try:
            os.remove(_LIB_PATH)
        except OSError:
            return None
        if not build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            _bind_symbols(lib)
        except AttributeError:
            return None
    _lib = lib
    return lib


def _bind_symbols(lib: ctypes.CDLL) -> None:
    lib.mfpa_wav_metadata.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.mfpa_wav_metadata.restype = ctypes.c_int
    lib.mfpa_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(_WavInfo),
    ]
    lib.mfpa_read_wav.restype = ctypes.c_int
    for fn_name in ("mfpa_read_mp3", "mfpa_read_audio"):
        fn = getattr(lib, fn_name)
        fn.argtypes = lib.mfpa_read_wav.argtypes
        fn.restype = ctypes.c_int
    lib.mfpa_mp3_metadata.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.mfpa_mp3_metadata.restype = ctypes.c_int
    lib.mfpa_mp3_available.restype = ctypes.c_int
    lib.mfpa_free.argtypes = [ctypes.c_void_p]
    lib.mfpa_read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(_WavInfo),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]


def available() -> bool:
    return _load() is not None


def wav_metadata(path: str) -> Tuple[int, int]:
    """(num_frames, sample_rate) header-only read."""
    lib = _load()
    info = _WavInfo()
    rc = lib.mfpa_wav_metadata(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"wav_metadata({path}) failed with code {rc}")
    return int(info.frames), int(info.sample_rate)


def _to_array(ptr, info: _WavInfo, lib) -> np.ndarray:
    n = info.frames * info.channels
    buf = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.mfpa_free(ptr)
    return np.ascontiguousarray(
        buf.reshape(info.frames, info.channels).T.astype(np.float32)
    )


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode to ((channels, frames) float32 in [-1, 1], sample_rate)."""
    lib = _load()
    info = _WavInfo()
    ptr = ctypes.POINTER(ctypes.c_float)()
    rc = lib.mfpa_read_wav(path.encode(), ctypes.byref(ptr), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"read_wav({path}) failed with code {rc}")
    return _to_array(ptr, info, lib), int(info.sample_rate)


def mp3_available() -> bool:
    """Whether the system libmpg123 could be loaded."""
    lib = _load()
    return lib is not None and bool(lib.mfpa_mp3_available())


def mp3_metadata(path: str) -> Tuple[int, int]:
    """(num_frames, sample_rate) via a stream scan (no PCM decode)."""
    lib = _load()
    info = _WavInfo()
    rc = lib.mfpa_mp3_metadata(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"mp3_metadata({path}) failed with code {rc}")
    return int(info.frames), int(info.sample_rate)


def read_mp3(path: str) -> Tuple[np.ndarray, int]:
    """Decode mp3 to ((channels, frames) float32, sample_rate) via the
    system libmpg123 (ref decodes mp3 through torchaudio,
    augmentation/utils.py:353)."""
    lib = _load()
    info = _WavInfo()
    ptr = ctypes.POINTER(ctypes.c_float)()
    rc = lib.mfpa_read_mp3(path.encode(), ctypes.byref(ptr), ctypes.byref(info))
    if rc != 0:
        raise IOError(f"read_mp3({path}) failed with code {rc}")
    return _to_array(ptr, info, lib), int(info.sample_rate)


def read_wav_batch(
    paths: List[str], num_threads: int = 0
) -> List[Optional[Tuple[np.ndarray, int]]]:
    """Thread-pool parallel decode; None for files that failed."""
    lib = _load()
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    infos = (_WavInfo * n)()
    rcs = (ctypes.c_int * n)()
    lib.mfpa_read_wav_batch(c_paths, n, outs, infos, rcs, num_threads)
    results: List[Optional[Tuple[np.ndarray, int]]] = []
    for i in range(n):
        if rcs[i] != 0:
            results.append(None)
            continue
        results.append((_to_array(outs[i], infos[i], lib), int(infos[i].sample_rate)))
    return results
