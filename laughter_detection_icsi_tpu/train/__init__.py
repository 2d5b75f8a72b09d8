"""Training: jitted steps, Adam, metrics, checkpointing."""

from laughter_detection_icsi_tpu.train.loop import (  # noqa: F401
    TrainLoop,
    Trainer,
    batch_metrics,
    bce_loss,
    update_metrics_on_disk,
)
from laughter_detection_icsi_tpu.train.optim import (  # noqa: F401
    Adam,
    AdamState,
    clip_by_global_norm,
    global_norm,
)
