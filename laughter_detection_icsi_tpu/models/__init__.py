"""Model zoo: binary laughter classifiers over (B, 1, T, F) log-mel windows.

Functional JAX re-designs of the reference's torch modules
(reference models.py:6-308): explicit pytree parameters/state, pure
``apply`` functions, jit/pjit-compatible.
"""

from laughter_detection_icsi_tpu.models.zoo import (  # noqa: F401
    MODEL_REGISTRY,
    MLPModel,
    Model,
    ResNet,
    ResNetBigger,
    ResNetNoBN,
    build,
    count_parameters,
)
