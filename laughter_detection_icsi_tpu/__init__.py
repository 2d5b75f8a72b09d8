"""TPU-native laughter-detection framework for the ICSI Meeting Corpus.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
LasseWolter/laughter-detection-icsi (reference mounted at /root/reference):

- ``ops``      — on-device compute: fused Kaldi-compatible log-mel (Fbank)
                 featurizer, sliding-window extraction, threshold + min-length
                 run-length smoothing (Pallas / XLA).
- ``models``   — the laughter-classifier model zoo (ResNetBigger et al.) as
                 functional JAX modules with explicit pytree parameters.
- ``train``    — jitted train/eval steps, Adam, metrics, checkpointing.
- ``data``     — audio decoding (SPHERE/WAV), feature cache, dataset sampling.
- ``eval``     — ICSI transcript parsing, interval indices, time-weighted
                 precision/recall evaluation, TextGrid IO.
- ``parallel`` — device-mesh sharding helpers (pjit/shard_map) for
                 data-parallel training and corpus-scale inference.
- ``runtime``  — native (C++) host-side runtime: audio decode + prefetch.
"""

__version__ = "0.1.0"
