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
                 data-parallel training, corpus-scale inference, and
                 live multi-channel streaming.
- ``runtime``  — native (C++) host-side runtime: audio decode + prefetch,
                 PCM wire packer.

Serving: ``inference.LaughterPipeline`` (offline) /
``inference.StreamingSession`` + ``parallel.ShardedStreamingSession``
(online, bit-exact vs offline); training keeps whole splits resident in
device HBM (``data.ResidentLadDataset``) and survives eviction with
exact mid-epoch resume (``train.loop.TrainLoop``).
"""

__version__ = "0.1.0"
