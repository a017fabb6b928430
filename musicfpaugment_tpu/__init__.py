"""musicfpaugment_tpu — TPU-native music augmentation + denoising + audio
fingerprinting framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
deezer/musicFPaugment (ISMIR-2023 LBD, arXiv:2310.13388): the AugmentFP
degradation chain, UNet/Demucs denoiser training, and peak-based audio
fingerprinting evaluation (audfprint + Dejavu), designed TPU-first
(device-resident noise/IR banks, fused batched transforms, lax.scan peak
kernels, data-parallel training over an ICI mesh).
"""

__version__ = "0.1.0"
