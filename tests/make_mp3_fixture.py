"""Generate tests/fixtures/tone.mp3 by encoding a known tone with the system
libmp3lame (ctypes). Run once; the fixture is committed so tests don't depend
on lame being present."""

from __future__ import annotations

import ctypes
import os

import numpy as np

SR = 22050
SECONDS = 2.0


def make_tone() -> np.ndarray:
    t = np.arange(int(SR * SECONDS)) / SR
    # two tones + envelope so decode correctness is spectrally checkable
    x = 0.6 * np.sin(2 * np.pi * 440.0 * t) + 0.3 * np.sin(2 * np.pi * 1320.0 * t)
    return (x * np.minimum(1.0, 10.0 * t)).astype(np.float32)


def encode_mp3(samples: np.ndarray, path: str) -> None:
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, SR)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_mode(gfp, 3)  # MONO
    lame.lame_set_brate(gfp, 128)
    assert lame.lame_init_params(gfp) >= 0
    n = len(samples)
    out_size = int(1.25 * n + 7200)
    out = (ctypes.c_ubyte * out_size)()
    pcm = (samples * 32767.0).astype(np.int16)
    written = lame.lame_encode_buffer(
        gfp,
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        None,
        n,
        out,
        out_size,
    )
    assert written >= 0, written
    tail = lame.lame_encode_flush(gfp, ctypes.byref(out, written), out_size - written)
    assert tail >= 0
    lame.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(bytes(out[: written + tail]))


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    path = os.path.join(here, "fixtures", "tone.mp3")
    encode_mp3(make_tone(), path)
    print(path, os.path.getsize(path), "bytes")
