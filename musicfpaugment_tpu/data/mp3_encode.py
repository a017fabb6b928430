"""mp3 *encoding* via the system libmp3lame (ctypes).

The decode path rides libmpg123 (native/mp3io.cc); this is its inverse, used
to materialize mp3 corpora for end-to-end tests and demos in environments
without a lame binary (the reference assumes pre-existing mp3 datasets —
training/dataset.py:20-65 — and never encodes). Optional: ``available()``
reports whether libmp3lame could be loaded.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

_lame: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lame, _failed
    if _lame is not None or _failed:
        return _lame
    try:
        name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
        lame = ctypes.CDLL(name)
        lame.lame_init.restype = ctypes.c_void_p
        _lame = lame
    except OSError:
        _failed = True
    return _lame


def available() -> bool:
    return _load() is not None


def encode_mp3(
    samples: np.ndarray, path: str, sample_rate: int, bitrate_kbps: int = 128
) -> None:
    """Encode mono float32 samples in [-1, 1] to an mp3 file."""
    lame = _load()
    if lame is None:
        raise RuntimeError("libmp3lame not available")
    samples = np.asarray(samples, np.float32).reshape(-1)
    gfp = ctypes.c_void_p(lame.lame_init())
    try:
        lame.lame_set_in_samplerate(gfp, int(sample_rate))
        lame.lame_set_num_channels(gfp, 1)
        lame.lame_set_mode(gfp, 3)  # MONO
        lame.lame_set_brate(gfp, int(bitrate_kbps))
        if lame.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")
        n = len(samples)
        out_size = int(1.25 * n + 7200)
        out = (ctypes.c_ubyte * out_size)()
        pcm = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
        written = lame.lame_encode_buffer(
            gfp,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            None,
            n,
            out,
            out_size,
        )
        if written < 0:
            raise RuntimeError(f"lame_encode_buffer failed: {written}")
        tail = lame.lame_encode_flush(
            gfp, ctypes.byref(out, written), out_size - written
        )
        if tail < 0:
            raise RuntimeError(f"lame_encode_flush failed: {tail}")
        with open(path, "wb") as f:
            f.write(bytes(out[: written + tail]))
    finally:
        lame.lame_close(gfp)
