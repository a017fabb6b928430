"""TPU-gated (compiled, non-interpret) Pallas agreement tests (VERDICT r1 #4).

The CPU suite runs the Pallas kernels in interpret mode only
(tests/test_audfprint.py); these tests compile the real Mosaic kernels and
check agreement with the scan path on actual TPU hardware. They skip on the
CPU CI mesh and are exercised by ``bench.py`` / direct TPU runs:

    JAX_PLATFORMS='' python -m pytest tests/test_pallas_tpu.py -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform in ("cpu",),
    reason="compiled Pallas kernels need real TPU hardware",
)


def test_compiled_pallas_peaks_agree_with_scan():
    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch

    wavs = jnp.asarray(
        np.random.default_rng(7).standard_normal((8, 4 * 8000)).astype(np.float32)
    )
    scan_masks = np.asarray(jax.device_get(
        jax.jit(lambda w: find_peaks_batch(w, use_pallas=False))(wavs)
    ))
    pallas_masks = np.asarray(jax.device_get(
        jax.jit(lambda w: find_peaks_batch(w, use_pallas=True))(wavs)
    ))
    assert scan_masks.shape == pallas_masks.shape
    disagreement = (scan_masks != pallas_masks).mean()
    # float-associativity differences only: documented bound ~1 cell per 300k
    assert disagreement < 1e-4, disagreement
    # both paths must actually find peaks
    assert scan_masks.sum() > 100 and pallas_masks.sum() > 100
