"""Runtime utilities (ref: training/utils.py:11-80).

The reference's ``set_gpus`` picks a free CUDA device via GPUtil and its
torch.distributed helpers are never initialized (SURVEY.md §2.6). TPU-native
counterparts: device selection is a platform query, and the distributed
helpers answer from ``jax.process_index``/``jax.process_count`` (real
multi-host support comes from ``jax.distributed.initialize`` + the mesh in
musicfpaugment_tpu.parallel).
"""

from __future__ import annotations

import os
import shutil

import numpy as np


def set_gpus(prefer: str = "tpu"):
    """Reference-named alias of :func:`set_devices`
    (ref: training/utils.py:40-62)."""
    return set_devices(prefer)


def set_devices(prefer: str = "tpu"):
    """Return the preferred available jax devices (set_gpus counterpart,
    ref: training/utils.py:40-62)."""
    import jax

    devices = jax.devices()
    preferred = [d for d in devices if prefer in d.platform.lower()]
    return preferred or devices


# torch.distributed helper counterparts (ref: training/utils.py:11-28)


def is_dist_avail_and_initialized() -> bool:
    import jax

    return jax.process_count() > 1


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def fix_random_seeds(seed: int = 59) -> None:
    """Global seed 59 like the reference (ref: training/utils.py:65-73).
    JAX randomness is explicit-key, so only numpy global state applies."""
    np.random.seed(seed)


def remove_val_cache(path: str = "/tmp/validation_set_cache") -> None:
    """Clear the validation-set cache files (ref: training/utils.py:76-80)."""
    for candidate in [path, path + ".index", path + ".data-00000-of-00001"]:
        if os.path.isdir(candidate):
            shutil.rmtree(candidate, ignore_errors=True)
        elif os.path.exists(candidate):
            os.remove(candidate)
